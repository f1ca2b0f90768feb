package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE tokenizer training (Sennrich et al., ACL 2016) —
  * the learn-the-merge-list half of tokenizer construction, run
  * against the full corpus instead of a sampled word list. */
object Bpe {

  /** Split a word into CODE POINTS, not UTF-16 code units —
    * `split(w, "")` breaks a surrogate pair (emoji, CJK extensions)
    * into two invalid half-symbols, while external engines (and the
    * q147/q148 oracles' `w[i]`) index code points. Java regex matches
    * per code point, so one-any-char extract-all keeps pairs whole. */
  private[graft] def codePointSyms(w: Column): Column =
    regexp_extract_all(w, lit("[\\s\\S]"), lit(0))

  /** Adjacent symbol pairs of a symbol sequence as
    * array<struct<l,r>>; empty (not a descending `sequence` artifact)
    * for words of fewer than two symbols. */
  private[graft] def pairsOf(sym: Column): Column =
    when(size(sym) >= 2, transform(sequence(lit(0), size(sym) - 2),
        i => struct(element_at(sym, i + 1).as("l"),
          element_at(sym, i + 2).as("r"))))
      .otherwise(expr("array()")
        .cast("array<struct<l:string,r:string>>"))

  /** True iff the pair (l, r) occurs adjacently in `sym`. NOT in the
    * training hot path (there, "affected" is detected by array
    * inequality against the merge kernel's output, which is cheaper
    * than any per-row pair-existence test) — kept as the reference
    * definition of the affected-word predicate, pinned by spec
    * against the inequality detection. */
  private[graft] def hasPair(sym: Column, l: Column, r: Column): Column =
    when(size(sym) >= 2, exists(sequence(lit(0), size(sym) - 2), i =>
        element_at(sym, i + 1) === l && element_at(sym, i + 2) === r))
      .otherwise(lit(false))

  private[graft] def hasPair(sym: Column, l: String, r: String): Column =
    hasPair(sym, lit(l), lit(r))

  /** Unsigned-lexicographic UTF-8 byte order — the ONE string order
    * every engine agrees on (Spark's UTF8String binary comparison,
    * DuckDB's ORDER BY, a byte-wise memcmp anywhere). Java's natural
    * String order compares UTF-16 code units instead, and the two
    * DISAGREE precisely where it bites a tokenizer: a
    * supplementary-plane symbol (emoji — surrogates D800..DFFF) sorts
    * BELOW a BMP symbol ≥ U+E000 in UTF-16 but ABOVE all of the BMP
    * in UTF-8. A pair-count tie broken with String order would pick a
    * different merge than the q147/q148 oracles and diverge the
    * entire subsequent merge list, so the driver argmax tie-break
    * goes through this instead. */
  private[graft] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val xi = x(i) & 0xff
      val yi = y(i) & 0xff
      if (xi != yi) return xi < yi
      i += 1
    }
    x.length < y.length
  }

  /** Full weighted pair count over a word table — run ONCE at
    * initialization; every later round maintains it by delta. */
  private[graft] def fullPairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("_sym")) >= 2)
      .select(explode(pairsOf(col("_sym"))).as("_p"), col("_n"))
      .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
      .agg(sum(col("_n")).as("cnt"))

  /** Learn `k` BPE merges from the corpus. Classic formulation:
    * training operates on the distinct-WORD frequency table (a corpus
    * collapses to |vocab| rows — the scale trick that makes
    * corpus-wide BPE cheap), each word a code-point-symbol sequence;
    * the weighted adjacent-pair count table is built ONCE (one full
    * aggregation), then maintained INCREMENTALLY across rounds
    * (Sennrich et al. §3): a merge of (l, r) only changes the pairs
    * of words in which (l, r) occurs adjacently, so each round
    * aggregates a count delta over the AFFECTED slice only — old
    * pairs at −n, merged pairs at +n, one map-combinable job — and
    * folds it into the standing table. The pair table itself lives in
    * DRIVER memory: its cardinality is bounded by the distinct
    * adjacent symbol pairs of the vocabulary (≈ alphabet² + O(k) new
    * symbols' neighborhoods — millions at web scale, never
    * corpus-proportional, and guarded by `maxPairs` against the
    * CJK-alphabet worst case where alphabet² outgrows the driver
    * heap), which makes the per-round argmax (ties: count desc, then
    * pair UTF-8-byte lexicographic — the order Spark's binary string
    * comparison and DuckDB's ORDER BY share, pinned so any engine
    * replays the exact merge list) a free in-memory scan instead of a
    * sort job. Per round the cluster runs exactly TWO jobs — the
    * affected-slice delta and the word-table cut (map-only merge
    * kernel, [[Checkpointer]] discipline, released eagerly) — and
    * shuffles only the affected words' pairs, versus the full-recount
    * loop's shuffle of EVERY pair occurrence every round (measured at
    * sf0.01/k=64: 8× fewer shuffle records, growing sub-linearly in
    * k; local WALL time is job-fixed-cost-bound and favors neither —
    * the shuffle ratio is what scales). At a production 32k-merge
    * vocab most rounds touch a vanishing fraction of words.
    *
    * Greedy left-to-right application equals the closed form "merge
    * every match, except in runs of l==r keep even offsets only",
    * which is what the DuckDB oracle replays (q147). Stops early if
    * no pair remains (fewer than k rows returned).
    *
    * Returns (rank, left, right, pair_count) — the ordered merge
    * list, i.e. the trained tokenizer. */
  def train(docs: DataFrame, textCol: String, k: Int,
      cp: Checkpointer = LocalCheckpoint,
      maxPairs: Int = 8 << 20): DataFrame = {
    require(k >= 1)
    require(maxPairs >= 1)
    trainingsStarted.incrementAndGet()
    val spark = docs.sparkSession
    var words = cp.cut(docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
      .select(codePointSyms(col("_w")).as("_sym"), col("_n")))
    // driver-resident pair table, seeded by the one and only full
    // pair aggregation. Its cardinality is bounded by the distinct
    // adjacent symbol pairs of the vocabulary — ≈ alphabet² + O(k)
    // merged-symbol neighborhoods. For ASCII-ish corpora that is
    // thousands of entries; a CJK-heavy corpus has ~10⁴ base symbols
    // and can observe ~10⁸ pairs, PAST what a driver heap holds. The
    // guard makes that a loud failure instead of a driver OOM
    // mid-job: `maxPairs` defaults to 8M entries (~1 GB of boxed
    // tuples — within a production driver, far below the CJK worst
    // case), checked STREAMING during the seed (toLocalIterator pulls
    // partition-by-partition, so the bound trips before the heap
    // fills) and after every round's delta fold.
    def guard(n: Int): Unit = require(n <= maxPairs,
      s"BPE pair table exceeds maxPairs=$maxPairs: observed >= $n " +
        "distinct adjacent symbol pairs (alphabet too large for " +
        "driver-resident counts — e.g. a CJK-heavy corpus at " +
        "alphabet^2 pairs). Shrink the alphabet (byte-level pre-split) " +
        "or raise maxPairs on a bigger driver; size it at >= the " +
        "distinct adjacent symbol pairs of the corpus, ~ min(alphabet^2 " +
        "+ k * alphabet, corpus pair kinds), at ~100 heap bytes per " +
        "entry (the 8M default ~ 1 GB).")
    val pairCounts =
      scala.collection.mutable.HashMap.empty[(String, String), Long]
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    // release the word-table cut on EVERY exit path — a guard trip
    // mid-training must not leave blocks pinned in a shared session
    try {
    val seed = fullPairCounts(words).toLocalIterator()
    while (seed.hasNext) {
      val row = seed.next()
      pairCounts((row.getString(0), row.getString(1))) = row.getLong(2)
      guard(pairCounts.size)
    }
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      if (pairCounts.isEmpty) exhausted = true
      else {
        // argmax by (count desc, l, r) with ties in UTF-8 byte order
        // (see utf8Less) — a Scala tuple minBy would compare strings
        // by UTF-16 code units and diverge from the oracles' ORDER BY
        // on astral-vs-BMP(≥U+E000) ties
        var best: ((String, String), Long) = null
        pairCounts.foreach { e =>
          if (best == null) best = e
          else {
            val ((bl, br), bc) = best
            val ((pl, pr), c) = e
            if (c > bc || (c == bc && (utf8Less(pl, bl) ||
                (pl == bl && utf8Less(pr, br))))) best = e
          }
        }
        val ((l, rt), cnt) = best
        merges += Row(r, l, rt, cnt)
        val mergedSym = graft.functions.VectorFunctions.bpeMerge(
          col("_sym"), lit(l), lit(rt))
        // pair-count delta: ONLY the affected words' pairs change —
        // their old pairs at −n and merged pairs at +n; "affected" is
        // detected by ARRAY INEQUALITY against the kernel's output
        // (one tight kernel pass + a memcmp-shaped compare per row),
        // NOT by an exists-over-pairs predicate, which would allocate
        // an index sequence per row and cost as much as the kernel
        // itself. The Generate barrier (explode of a 1-element array)
        // materializes the merged array once per row — pairsOf
        // references its argument ~2·len times, and CollapseProject
        // would inline the merge kernel into every one of them: the
        // same project-collapse trap documented at Similarity's
        // pqEncode.
        val delta = words
          .select(col("_sym"), col("_n"),
            explode(array(mergedSym)).as("_msym"))
          .filter(!(col("_msym") <=> col("_sym")))
          .select(explode(concat(
            transform(pairsOf(col("_sym")), p =>
              struct(p.getField("l").as("l"), p.getField("r").as("r"),
                (-col("_n")).as("d"))),
            transform(pairsOf(col("_msym")), p =>
              struct(p.getField("l").as("l"), p.getField("r").as("r"),
                col("_n").as("d"))))).as("_e"))
          .groupBy(col("_e.l").as("l"), col("_e.r").as("r"))
          .agg(sum(col("_e.d")).as("d"))
          .filter(col("d") =!= 0)
          .collect()
        delta.foreach { row =>
          val key = (row.getString(0), row.getString(1))
          val nv = pairCounts.getOrElse(key, 0L) + row.getLong(2)
          if (nv > 0) pairCounts(key) = nv else pairCounts.remove(key)
        }
        guard(pairCounts.size)
        // one unconditional kernel pass over the word table (a no-op
        // copy for unaffected words — cheaper than guarding with a
        // per-row pair-existence test), cut EVERY round: a deferred
        // cut is not an option here — each uncut layer references its
        // input several times, so lazy stacking duplicates the
        // previous layer's tree per reference and the expression
        // grows exponentially with chain depth
        val oldWords = words
        words = cp.cut(words.select(mergedSym.as("_sym"), col("_n")))
        cp.release(oldWords)
        r += 1
      }
    }
    } finally cp.release(words)
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
  /** Count of [[train]] invocations in this JVM — the observability
    * hook for the one-training-per-input-per-run memo contract
    * ([[TrainMemo]]); spec-pinned, never read by engine code. */
  private[graft] val trainingsStarted =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** [[train]] through the per-JVM [[TrainMemo]]: the catalog's
    * encode/fertility/compare queries (q148/q157/q161) each need the
    * SAME deterministic k-merge list q147 learns — memoization makes
    * the distributed training run once per distinct (input, k) per
    * process instead of once per query. Default checkpointer and
    * pair guard only: a custom `cp`/`maxPairs` changes failure
    * behavior, not results, and cache keys deliberately ignore it. */
  def trainMemoized(docs: DataFrame, textCol: String, k: Int): DataFrame =
    TrainMemo.cached(s"bpe:$textCol:$k", docs)(train(docs, textCol, k))

  /** The memoized merge list in application order — the shape
    * [[encodeTokenCounts]] consumes. */
  def mergesMemoized(docs: DataFrame, textCol: String,
      k: Int): Seq[(String, String)] =
    trainMemoized(docs, textCol, k).orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  def encodeTokenCounts(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val chars = codePointSyms(col("_w"))
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
