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
    * Ids must be non-negative; order is total because ids are unique. */
  def packBudget(df: DataFrame, idCol: String, tokens: Column,
      budget: Long, bucketSpan: Long = 65536L): DataFrame = {
    require(budget > 0 && bucketSpan > 0)
    val base = df.select(col(idCol).as("_id"), tokens.cast("long").as("n_tokens"))
      .withColumn("_bkt", expr(s"_id div ${bucketSpan}L"))
    val local = base.withColumn("_end",
      sum(col("n_tokens")).over(Window.partitionBy(col("_bkt")).orderBy(col("_id"))))
    val offs = base.groupBy(col("_bkt"))
      .agg(sum(col("n_tokens")).as("_t"))
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
}
