package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the training-shard assignment step
  * of an LLM data pipeline: documents are laid out in deterministic id
  * order, token counts accumulate, and each document is assigned to
  * the fixed-size shard its start offset falls in (the "concatenate
  * then chop" packing used for pretraining batches).
  *
  * The global running sum is computed WITHOUT a global single-partition
  * window (the naive `Window.orderBy(id)` collapses 100 TB onto one
  * task). Instead: documents bucket by `id div bucketSpan` — bucket
  * boundaries align with id order, so a per-bucket running sum plus a
  * cumulative per-bucket offset reconstructs the exact global prefix
  * sum. Shapes: one slim shuffle of (id, n_tokens) rows on the bucket
  * key, one map-side-combined per-bucket total (n/bucketSpan tiny
  * rows, windowed in a single task — tune `bucketSpan` so that stays
  * driver-scale), one broadcast join back. No row ever carries text.
  */
object Packing {

  /** Assign each row to a token-budget shard by its global start
    * offset in id order. Returns (_id, n_tokens, start, shard,
    * shard_offset, spills): `spills` marks documents crossing a shard
    * boundary (the tail that a training loader would truncate or wrap).
    * Ids must be non-negative; order is total because ids are unique.
    * The tokens expression must be non-null — a null count would
    * propagate into every later start offset's meaning. */
  /** Release manifest over a [[packBudget]] shard assignment: one row
    * per shard with doc/token totals, the id span, and an
    * ORDER-INDEPENDENT content checksum (sum of the docs' rolling
    * text fingerprints mod 1e9+7 — commutative, so any partitioning
    * and any replaying engine produce the identical value). This is
    * the integrity artifact a dataset release ships: a consumer
    * re-derives each shard's checksum after download and compares.
    * `docFp` is the (_id, _fp) fingerprint table (one text pass,
    * [[TextAnalysis.fingerprint]]); the manifest itself is one keyed
    * join of slim rows plus one map-combinable aggregation. */
  def shardManifest(assignment: DataFrame, docFp: DataFrame): DataFrame =
    assignment.select(col("_id"), col("n_tokens"), col("shard"))
      .join(docFp.select(col("_id"),
        pmod(col("_fp"), lit(TextAnalysis.FpMod)).as("_fp")), "_id")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("_id")).as("min_id"),
        max(col("_id")).as("max_id"),
        pmod(sum(col("_fp")), lit(TextAnalysis.FpMod)).as("checksum"))

  /** Release-over-release manifest diff — the regression check a
    * corpus release runs before shipping: full-outer join of two
    * [[shardManifest]] tables on shard id, each shard classified
    * added / removed / changed (any of docs, tokens, or the
    * order-independent checksum moved) / unchanged. Shard-cardinality
    * tiny on both sides; one keyed join. */
  def manifestDiff(oldM: DataFrame, newM: DataFrame): DataFrame = {
    val o = oldM.select(col("shard"), col("n_docs").as("_od"),
      col("n_tokens").as("_ot"), col("checksum").as("_oc"))
    val n = newM.select(col("shard"), col("n_docs").as("_nd"),
      col("n_tokens").as("_nt"), col("checksum").as("_nc"))
    o.join(n, Seq("shard"), "full")
      .select(col("shard"),
        when(col("_od").isNull, "added")
          .when(col("_nd").isNull, "removed")
          .when(col("_oc") =!= col("_nc") || col("_od") =!= col("_nd")
            || col("_ot") =!= col("_nt"), "changed")
          .otherwise("unchanged").as("status"),
        col("_od").as("v1_docs"), col("_nd").as("v2_docs"),
        col("_oc").as("v1_checksum"), col("_nc").as("v2_checksum"))
  }

  def packBudget(df: DataFrame, idCol: String, tokens: Column,
      budget: Long, bucketSpan: Long = 65536L,
      cp: Checkpointer = LocalCheckpoint): DataFrame = {
    require(budget > 0 && bucketSpan > 0)
    val base = df.select(col(idCol).as("_id"), tokens.cast("long").as("n_tokens"))
      .withColumn("_bkt", expr(s"_id div ${bucketSpan}L"))
    // materialize the windowed slim rows ONCE (Dedup's Checkpointer
    // discipline): the offsets branch and the final join both consume
    // them, and without the cut each would re-derive the token counts
    // from text — the expensive pass at 100 TB
    val local = cp.cut(base.withColumn("_end",
      sum(col("n_tokens")).over(Window.partitionBy(col("_bkt")).orderBy(col("_id")))))
    val offs = local.groupBy(col("_bkt"))
      .agg(max(col("_end")).as("_t"))
      .withColumn("_off", coalesce(
        sum(col("_t")).over(Window.orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bkt"), col("_off"))
    local.join(broadcast(offs), "_bkt")
      .withColumn("start", col("_off") + col("_end") - col("n_tokens"))
      .withColumn("shard", expr(s"start div ${budget}L"))
      .withColumn("shard_offset", pmod(col("start"), lit(budget)))
      .withColumn("spills", col("shard_offset") + col("n_tokens") > budget)
      .select(col("_id"), col("n_tokens"), col("start"), col("shard"),
        col("shard_offset"), col("spills"))
  }

  /** Interleaved MULTIMODAL budget packing — the VLM training-shard
    * shape: each document contributes its text tokens, and a document
    * with an attached image contributes that image's ViT patch tokens
    * IMMEDIATELY AFTER its text (interleaved item order: item 2·doc
    * is the text, 2·doc+1 the image), and the whole mixed sequence
    * packs into fixed token-budget shards. Image cost =
    * ⌈w/patch⌉·⌈h/patch⌉ from the DECODED dimensions
    * ([[Images.decodedMeta]]) — integral ceilings, so the cost table
    * replays exactly in any engine. Heterogeneous costs change
    * NOTHING about the scale discipline: the assignment is the same
    * two-phase bucketed prefix sum as [[packBudget]] (no global
    * window), the union is map-side, and the kind join-back is on the
    * slim item table. Returns the [[packBudget]] assignment plus
    * `kind` ('text' | 'image'): (_id, kind, n_tokens, start, shard,
    * shard_offset, spills). */
  def packMultimodal(docs: DataFrame, idCol: String, textCol: String,
      mediaDims: DataFrame, patch: Int, budget: Long,
      bucketSpan: Long = 65536L,
      cp: Checkpointer = LocalCheckpoint): DataFrame = {
    require(patch > 0, s"patch size must be positive, got $patch")
    packMultimodalCosts(docs, idCol, textCol,
      mediaDims.select(col("media_id"), lit("image").as("kind"),
        (expr(s"(width + ${patch - 1}) div $patch") *
          expr(s"(height + ${patch - 1}) div $patch")).cast("long")
          .as("cost")),
      budget, bucketSpan, cp)
  }

  /** [[packMultimodal]] generalized to ARBITRARY media costs — the
    * entry point for modalities whose accelerator cost is not a
    * single frame's patch grid: video contributes
    * n_frames × patches-per-frame ([[graft.ext.Video.decodedMeta]]),
    * audio would contribute codec-frame counts. `mediaCosts` carries
    * (media_id, kind, cost); each media item interleaves directly
    * after its document's text (2·doc / 2·doc+1), and the assignment
    * is the same two-phase bucketed prefix sum — heterogeneous costs
    * never change the no-global-window shape. */
  def packMultimodalCosts(docs: DataFrame, idCol: String,
      textCol: String, mediaCosts: DataFrame, budget: Long,
      bucketSpan: Long = 65536L,
      cp: Checkpointer = LocalCheckpoint): DataFrame = {
    val text = docs.select((col(idCol).cast("long") * 2).as("_mid"),
      lit("text").as("kind"),
      graft.ext.TextAnalysis.tokenCount(col(textCol)).cast("long")
        .as("_cost"))
    val media = mediaCosts.select(
      (col("media_id").cast("long") * 2 + 1).as("_mid"),
      col("kind"), col("cost").cast("long").as("_cost"))
    val items = text.unionByName(media)
    packBudget(items, "_mid", col("_cost"), budget, bucketSpan, cp)
      .join(items.select(col("_mid").as("_id"), col("kind")), "_id")
      .select(col("_id"), col("kind"), col("n_tokens"), col("start"),
        col("shard"), col("shard_offset"), col("spills"))
  }

  /** Materialize the packed training sequences: [[packBudget]]'s shard
    * assignment joined back to the text and concatenated in offset
    * order with an EOS separator — the blob a pretraining loader
    * actually reads. One full-text shuffle (inherent: rows must meet
    * their shard) and a per-shard sorted concat whose memory is
    * bounded by ~budget tokens of text per group, independent of
    * corpus size. */
  def packMaterialize(df: DataFrame, idCol: String, textCol: String,
      tokens: Column, budget: Long, bucketSpan: Long = 65536L,
      eos: String = " <eos> ", cp: Checkpointer = LocalCheckpoint): DataFrame = {
    val assign = packBudget(df, idCol, tokens, budget, bucketSpan, cp)
      .select(col("_id"), col("n_tokens"), col("start"), col("shard"))
    df.select(col(idCol).as("_id"), col(textCol).as("_text"))
      .join(assign, "_id")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        concat_ws(eos, transform(
          sort_array(collect_list(struct(col("start"), col("_text")))),
          s => s.getField("_text"))).as("packed"))
  }

  /** Context-window chunking: split each document's token sequence
    * into fixed-size windows with `overlap` shared tokens between
    * consecutive chunks (stride = window − overlap) — the
    * long-document step before sequence packing. Chunk k covers token
    * positions [k·stride, k·stride + window); the last chunk may be
    * short. Entirely map-side: one tokenize pass, chunks generated in
    * the same projection (explode), NO shuffle — at 100 TB this is a
    * pure scan transform that composes with [[packBudget]] downstream.
    * Returns (doc_id, chunk_id, n_tokens, chunk). */
  def chunkDocs(docs: DataFrame, textCol: String, idCol: String,
      window: Int, overlap: Int = 0): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    docs.select(col(idCol).as("doc_id"),
        graft.ext.TextAnalysis.tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col("doc_id"), col("_toks"),
        explode(sequence(lit(0),
          expr(s"(size(_toks) - 1) div $stride"))).as("chunk_id"))
      .withColumn("_ck",
        slice(col("_toks"), col("chunk_id") * stride + 1, lit(window)))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        size(col("_ck")).as("n_tokens"),
        concat_ws(" ", col("_ck")).as("chunk"))
  }

  /** Deterministic epoch shuffle: a global training-order permutation
    * index (`ord` = dense rank in (hash31(id), id) order) plus a
    * round-robin shard over that order — the "shuffle then shard"
    * step before writing training splits. Seed folds into the hash so
    * each epoch is a different reproducible permutation.
    *
    * Same no-global-window discipline as [[packBudget]], bucketing on
    * hash RANGES (hash div span) instead of id ranges: bucket
    * boundaries align with hash order, so per-bucket ranks plus
    * cumulative bucket counts reconstruct the exact global rank. */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int,
      seed: Long = 0L, nBuckets: Int = 1024): DataFrame = {
    require(nShards > 0 && nBuckets > 0)
    val span = (1L << 31) / nBuckets + 1L
    val h = pmod(pmod(col("_id") + lit(seed), lit(2147483648L))
      * lit(2654435761L), lit(2147483647L))
    val base = df.select(col(idCol).as("_id"))
      .withColumn("_h", h)
      .withColumn("_bkt", expr(s"_h div ${span}L"))
    val local = base.withColumn("_rn", row_number().over(
      Window.partitionBy(col("_bkt")).orderBy(col("_h"), col("_id"))))
    val offs = base.groupBy(col("_bkt")).agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bkt"), col("_off"))
    local.join(broadcast(offs), "_bkt")
      .withColumn("ord", col("_off") + col("_rn") - 1)
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)))
      .select(col("_id"), col("ord"), col("shard"))
  }

  /** Length-bucketed padded batching — the SFT/fine-tuning dataloader
    * counterpart of [[packBudget]]'s pretraining concat-packing:
    * sequences are NOT concatenated but padded to their batch maximum,
    * so batch composition decides how many pad tokens the accelerator
    * burns. Bucketing by length bin (`_v div bucketWidth`) before
    * cutting deterministic `batchSize`-row batches (id order within
    * bin) bounds intra-batch length spread to one bin width — the
    * standard bucketed-batching trick. Returns the per-bin waste
    * dashboard: (len_bucket, bucket_lo, n_seqs, n_batches, pad_tokens,
    * padded_tokens, pad_frac_micro) — the artifact that justifies (or
    * rejects) a bucket-width choice before a training run.
    *
    * Same no-global-window discipline as [[packBudget]]: the in-bin
    * rank comes from per-(bin, id-span) local row numbers plus
    * broadcast cumulative span offsets (the window runs over the
    * bin × span COUNT table, never the corpus); batch stats are one
    * keyed aggregation on (bin, batch) and the dashboard a second on
    * bin. Integer-exact throughout (pad_frac in micro-units by
    * DECIMAL division), so an external engine replays every row
    * (q194). */
  def bucketBatches(df: DataFrame, idCol: String, tokens: Column,
      bucketWidth: Long, batchSize: Int,
      bucketSpan: Long = 65536L): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0 && bucketSpan > 0)
    val base = df.select(col(idCol).cast("long").as("_id"),
        tokens.cast("long").as("_v"))
      .withColumn("_lb", expr(s"_v div ${bucketWidth}L"))
      .withColumn("_sp", expr(s"_id div ${bucketSpan}L"))
    val local = base.withColumn("_rn", row_number().over(
      Window.partitionBy(col("_lb"), col("_sp")).orderBy(col("_id"))))
    val offs = base.groupBy(col("_lb"), col("_sp"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.partitionBy(col("_lb"))
          .orderBy(col("_sp"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_lb"), col("_sp"), col("_off"))
    val ranked = local.join(broadcast(offs), Seq("_lb", "_sp"))
      .withColumn("_batch", expr(s"(_off + _rn - 1) div ${batchSize}L"))
    val perBatch = ranked.groupBy(col("_lb"), col("_batch"))
      .agg(count(lit(1)).as("_cnt"), max(col("_v")).as("_mx"),
        sum(col("_v")).as("_ts"))
    perBatch.groupBy(col("_lb"))
      .agg(sum(col("_cnt")).as("n_seqs"),
        count(lit(1)).as("n_batches"),
        sum(col("_cnt") * col("_mx") - col("_ts")).as("pad_tokens"),
        sum(col("_cnt") * col("_mx")).as("padded_tokens"))
      .select(col("_lb").as("len_bucket"),
        (col("_lb") * bucketWidth).as("bucket_lo"),
        col("n_seqs"), col("n_batches"), col("pad_tokens"),
        col("padded_tokens"),
        when(col("padded_tokens") === 0, lit(0L)).otherwise(
          expr("CAST((CAST(pad_tokens AS DECIMAL(38,0)) * 1000000)" +
            " div padded_tokens AS BIGINT)")).as("pad_frac_micro"))
  }
}
