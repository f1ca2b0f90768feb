package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE tokenizer training (Sennrich et al., ACL 2016) —
  * the learn-the-merge-list half of tokenizer construction, run
  * against the full corpus instead of a sampled word list. */
object Bpe {

  /** Learn `k` BPE merges from the corpus. Classic formulation:
    * training operates on the distinct-WORD frequency table (a corpus
    * collapses to |vocab| rows — the scale trick that makes
    * corpus-wide BPE cheap), each word a character-symbol sequence;
    * each round counts adjacent symbol pairs weighted by word
    * frequency (one map-side-combinable aggregation over slim pair
    * rows), picks the max-count pair (ties: count desc, then pair
    * lexicographic — pinned so any engine replays the exact merge
    * list), and applies the merge to every word (map-only
    * [[graft.functions.BpeMerge]] kernel). Per-round state is the
    * word table, cut with the [[Checkpointer]] discipline and
    * released eagerly; the single-row argmax collect per round is
    * bounded driver traffic (k rows total).
    *
    * Greedy left-to-right application equals the closed form "merge
    * every match, except in runs of l==r keep even offsets only",
    * which is what the DuckDB oracle replays (q147). Stops early if
    * no pair remains (fewer than k rows returned).
    *
    * Returns (rank, left, right, pair_count) — the ordered merge
    * list, i.e. the trained tokenizer. */
  def train(docs: DataFrame, textCol: String, k: Int,
      cp: Checkpointer = LocalCheckpoint): DataFrame = {
    require(k >= 1)
    val spark = docs.sparkSession
    var words = cp.cut(docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
      .select(filter(split(col("_w"), ""), s => length(s) > 0).as("_sym"),
        col("_n")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val top = words.filter(size(col("_sym")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("_sym")) - 2),
          i => struct(element_at(col("_sym"), i + 1).as("l"),
            element_at(col("_sym"), i + 2).as("r")))).as("_p"), col("_n"))
        .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
        .agg(sum(col("_n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Row(r, l, rt, cnt)
        val old = words
        words = cp.cut(words.select(
          graft.functions.VectorFunctions.bpeMerge(col("_sym"),
            lit(l), lit(rt)).as("_sym"), col("_n")))
        cp.release(old)
        r += 1
      }
    }
    cp.release(words)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Tokenize the corpus with a learned merge list: per-document BPE
    * token counts — the sizing pass every packing/budgeting stage
    * consumes ([[Packing.packBudget]] takes exactly this shape).
    *
    * Scale shape: the merge chain (k chained codegen
    * [[graft.functions.BpeMerge]] kernels) applies ONCE per DISTINCT
    * word — the same vocabulary collapse training uses — and
    * per-document counts come from a keyed join of the slim
    * (doc, word) rows against the word→length vocabulary (broadcast
    * at real scale) plus one map-combinable sum. Documents with no
    * tokens produce no row (explode semantics), identically in the
    * oracle (q148). */
  def encodeTokenCounts(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val chars = filter(split(col("_w"), ""), s => length(s) > 0)
    val applied = merges.foldLeft(chars) { case (acc, (l, r)) =>
      graft.functions.VectorFunctions.bpeMerge(acc, lit(l), lit(r))
    }
    val words = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("_w"))
    val vocab = words.select(col("_w")).distinct()
      .select(col("_w"), size(applied).cast("long").as("_len"))
    words.join(vocab, "_w")
      .groupBy(col(idCol))
      .agg(sum(col("_len")).as("n_bpe_tokens"))
  }
}
