package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication via suffix-array ranks (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better" —
  * the ExactSubstr formulation): find every duplicated token span of
  * length ≥ `spanLen` across the corpus and emit the merged
  * to-remove intervals, keeping one occurrence per duplicated
  * substring.
  *
  * The scale problem this solves: the n-gram formulation
  * (q78/q128's gram ownership) materializes one gram PER POSITION of
  * length n — at the 50-token spans the paper uses, a 50× data
  * blowup before the first shuffle. The suffix-array trick gets
  * length-L substring EQUALITY with one row per position throughout:
  * prefix-doubling ranks (Manber–Myers) — round k assigns each
  * position a dense rank of the pair (rank_{k-1}(i),
  * rank_{k-1}(i + 2^{k-1})) so rank_k identifies the 2^k-token
  * substring at i — then the classic O(1) substring-equality key
  * `(rank_h(i), rank_h(i + L - 2^h))` with 2^h ≤ L < 2^{h+1}: two
  * overlapping full 2^h-blocks cover [i, i+L) exactly, so key
  * equality ⟺ L-substring equality. ⌈log₂ L⌉ rank rounds replace the
  * L× gram explosion; every round is one distinct + one range-rank +
  * one keyed join of position rows.
  *
  * Determinism/portability: ranks are DENSE RANKS in sort order
  * (tokens in UTF-8 byte order — the order Spark's binary string
  * comparison and DuckDB's ORDER BY share; rank pairs as integer
  * pairs with the out-of-doc sentinel −1 below every real rank), so
  * the whole chain — every intermediate rank table included — replays
  * in an external engine (q188's oracle unrolls the rounds with
  * `dense_rank()`).
  *
  * Truncation soundness: positions within 2^k of the document end
  * get sentinel pairs (−1 second components) at some doubling level,
  * so a truncated block can never share a rank with a full block; the
  * span-fits filter (i + L − 1 ≤ doc length) then guarantees both key
  * blocks are full.
  *
  * Scale shape: no global window ever sees corpus-sized data — the
  * global dense rank is a two-phase range rank (distinct keys →
  * `repartitionByRange` → per-partition row_number + an exclusive
  * prefix-sum of the ≤`nRankParts`-row partition-count sliver);
  * per-document `lead`s ride doc-keyed windows; the final interval
  * merge is a doc-keyed gaps-and-islands. Rank values are positions
  * in the sorted distinct-key order, so they are independent of
  * partition boundaries (range partitioner sampling included).
  */
object SuffixDedup {

  /** Two-phase global dense rank of `df`'s distinct `keys` rows in
    * ascending sort order, joined back onto `df` as `out` — the
    * partition-less-window-free formulation. Ranks are 1-based,
    * identical to SQL `dense_rank() OVER (ORDER BY keys)`. */
  private[graft] def denseRankJoin(df: DataFrame, keys: Seq[String],
      out: String, nRankParts: Int = 32): DataFrame = {
    val kc = keys.map(col)
    val parts = df.select(kc: _*).distinct()
      .repartitionByRange(nRankParts, kc.map(_.asc): _*)
      .withColumn("_pid", spark_partition_id())
    // exclusive offsets over the <= nRankParts partition-count rows —
    // a constant-bounded frame (NOT corpus-sized), same contract as
    // the catalog's TakeOrdered-bounded windows
    val offs = parts.groupBy(col("_pid")).agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    val ranked = parts
      .withColumn("_lr", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(kc.map(_.asc): _*)))
      .join(broadcast(offs), "_pid")
      .select(kc :+ (col("_off") + col("_lr")).as(out): _*)
    df.join(ranked, keys)
  }

  /** One position row per token: (idCol, _pos 1-based, _tok, _dlen). */
  private def positions(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("_p0", "_tok")))
      .withColumn("_pos", col("_p0") + 1).drop("_p0")
      .withColumn("_dlen", max(col("_pos")).over(
        Window.partitionBy(col(idCol))))

  /** All duplicated length-`spanLen` token positions: (idCol, _pos,
    * keeper_id, keeper_pos) for every position whose span also occurs
    * elsewhere in the corpus, keeper = globally first occurrence
    * (min (doc, pos)) of that exact substring. The building block of
    * [[duplicateSpans]]; exposed for the parity spec vs the n-gram
    * formulation. */
  def duplicatePositions(docs: DataFrame, textCol: String, idCol: String,
      spanLen: Int, nRankParts: Int = 32): DataFrame = {
    require(spanLen >= 2, "spanLen >= 2: single tokens are vocabulary")
    val h = 63 - java.lang.Long.numberOfLeadingZeros(spanLen.toLong)
    val half = 1L << h // 2^h <= spanLen < 2^(h+1)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    var r = denseRankJoin(
      positions(docs, textCol, idCol), Seq("_tok"), "_r", nRankParts)
      .select(col(idCol), col("_pos"), col("_dlen"), col("_r"))
    for (k <- 1 to h.toInt) {
      val step = 1 << (k - 1)
      val paired = r.withColumn("_r2",
        coalesce(lead(col("_r"), step).over(byDoc), lit(-1L)))
      r = denseRankJoin(paired, Seq("_r", "_r2"), "_rn", nRankParts)
        .select(col(idCol), col("_pos"), col("_dlen"),
          col("_rn").as("_r"))
    }
    val off = spanLen - half.toInt
    val keyed = r
      .withColumn("_k2",
        if (off == 0) col("_r")
        else coalesce(lead(col("_r"), off).over(byDoc), lit(-1L)))
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

  /** Merged to-remove token intervals per document: every
    * NON-KEEPER duplicated `spanLen`-token span, overlapping-or-
    * adjacent intervals coalesced (gaps-and-islands per doc) —
    * (idCol, span_start, span_end), 1-based inclusive token
    * positions. Remove these and exactly one occurrence of every
    * duplicated substring survives, the Lee et al. ExactSubstr
    * contract. */
  def duplicateSpans(docs: DataFrame, textCol: String, idCol: String,
      spanLen: Int, nRankParts: Int = 32): DataFrame = {
    val rm = duplicatePositions(docs, textCol, idCol, spanLen, nRankParts)
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
}
