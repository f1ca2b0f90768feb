package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-family tokenizer training — the OTHER tokenizer family
  * real pipelines compare against BPE (SentencePiece's unigram-LM,
  * Kudo 2018). This implementation keeps the family's shape —
  * substring candidate vocabulary, iterative segment→count→prune
  * refinement, final per-piece scores — but replaces the two pieces
  * that cannot replay bit-exactly across engines:
  *
  *  - segmentation is GREEDY MAXIMAL MUNCH (WordPiece's inference
  *    rule: the longest vocabulary piece at each position) instead of
  *    float-log-prob Viterbi, so a segmentation is a pure function of
  *    (word, vocabulary) in integer/string arithmetic;
  *  - refinement is hard-EM frequency pruning (keep the top
  *    `topPieces` multi-char pieces by segmentation usage, ties in
  *    UTF-8 order; single chars are never pruned, guaranteeing
  *    coverage) instead of soft EM over expected counts with
  *    likelihood-loss pruning.
  *
  * Every quantity is an exact integer or a string comparison both
  * Spark (UTF8String binary order) and DuckDB (ORDER BY) share, so
  * the full train — candidate seeding, every segmentation round, the
  * prunes, the final scores — replays in the q158 oracle, mirroring
  * q147's closed-form BPE discipline.
  *
  * Scale shape: training operates on the distinct-WORD frequency
  * table (the corpus collapses to |vocab| rows — same trick as
  * [[Bpe.train]]). Segmentation is a driver-paced frontier loop of at
  * most max-word-length steps; each step is ONE equi-join of the
  * (word, position) frontier against the piece table — the non-equi
  * "substring starting at pos matches piece" predicate is made
  * hash-joinable by exploding candidate lengths 1..maxPieceLen on the
  * frontier side, so the join keys are (substring(w,pos,l), l) =
  * (piece, len(piece)) and no nested-loop join ever appears. The
  * frontier only shrinks (words leave as they finish); per-step state
  * is cut with the [[Checkpointer]] discipline and released at round
  * end. The round-1
  * candidate table stays DISTRIBUTED (never collected); only pruned
  * vocabularies (≤ alphabet + topPieces rows each) are
  * driver-materialized. */
object Unigram {

  private val outSchema = StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("piece_len", IntegerType, nullable = false),
    StructField("usage", LongType, nullable = false)))

  private def vocabDf(spark: org.apache.spark.sql.SparkSession,
      pieces: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        pieces.distinct.sorted.map(p => Row(p, p.length)), 1),
      StructType(Seq(StructField("_piece", StringType),
        StructField("_plen", IntegerType))))

  /** Distinct-word frequency table (w, n) of a corpus. */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))

  /** One munch step: longest vocabulary piece (fallback: the single
    * char — the unknown-piece convention, unreachable in training
    * where every observed char is in the vocabulary) at each
    * frontier position. Returns (_w, _n, _pos, _len, _piece). */
  private def munchStep(frontier: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val cands = frontier.select(col("_w"), col("_n"), col("_pos"),
      explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("_w")) - col("_pos") + 1)))
        .as("_l"))
    // LEFT join + longest-match argmax; max(struct) is safe because
    // the matched piece is determined by its length (it IS the
    // substring), so (length, piece) pairs never tie
    cands
      .join(vocab, expr("substring(_w, _pos, _l) = _piece AND _l = _plen"),
        "left")
      .groupBy(col("_w"), col("_n"), col("_pos"))
      .agg(max(struct(col("_plen"), col("_piece"))).as("_b"))
      .select(col("_w"), col("_n"), col("_pos"),
        coalesce(col("_b._plen"), lit(1)).as("_len"),
        coalesce(col("_b._piece"),
          expr("substring(_w, _pos, 1)")).as("_piece"))
  }

  /** Full greedy segmentation of the word table: per-piece weighted
    * usage (lazy — the caller materializes what it needs, then
    * releases `cuts`). Steps are cut EAGERLY on purpose: a lazy chain
    * nests step k's subtree inside steps k+1..maxSteps AND the usage
    * union (~maxSteps²/2 copies), and the optimizer/AQE pays
    * per-copy planning cost that measurably exceeds the one-job-per-
    * step round-trip (measured: lazy-chained training was ~1.7×
    * slower at sf0.1). At scale the per-step job overhead amortizes
    * into the frontier join itself. (An isEmpty early-exit probe was
    * measured too: it costs a job per step and the greedy munch of a
    * natural corpus does reach max-word-length depth — all-unknown
    * words segment into single chars — so it never fires.) */
  private def segment(wc: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxSteps: Int, cp: Checkpointer,
      cuts: scala.collection.mutable.ArrayBuffer[DataFrame]): DataFrame = {
    val steps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var frontier = wc.select(col("_w"), col("_n"), lit(1).as("_pos"))
    for (_ <- 1 to maxSteps) {
      val cut = cp.cut(munchStep(frontier, vocab, maxPieceLen))
      cuts += cut
      steps += cut.select(col("_piece"), col("_n"))
      frontier = cut
        .select(col("_w"), col("_n"), (col("_pos") + col("_len")).as("_pos"))
        .filter(col("_pos") <= length(col("_w")))
    }
    steps.reduce(_ unionByName _)
      .groupBy(col("_piece")).agg(sum(col("_n")).as("_usage"))
  }

  /** Train a pruned maximal-munch vocabulary: seed with every
    * substring of length ≤ `maxPieceLen` whose weighted corpus
    * frequency is ≥ `minCount` (plus all single chars); then
    * `rounds − 1` refinement rounds of segment → usage-count → keep
    * the top `topPieces` multi-char pieces (usage desc, piece UTF-8
    * asc — a distributed TakeOrdered, never a full sort; chars never
    * pruned); the final round only counts. Returns
    * (piece, piece_len, usage): the last pruned vocabulary scored by
    * the final segmentation, fully detached from cluster state. */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      minCount: Long = 2L, topPieces: Int = 12, rounds: Int = 2,
      cp: Checkpointer = LocalCheckpoint): DataFrame = {
    require(maxPieceLen >= 1 && topPieces >= 0)
    require(rounds >= 2,
      "rounds >= 2: at least one prune round plus the scoring round")
    trainingsStarted.incrementAndGet()
    val spark = docs.sparkSession
    val wc = cp.cut(wordCounts(docs, textCol))
    try {
      val maxLenRow = wc.agg(max(length(col("_w")))).head()
      if (maxLenRow.isNullAt(0)) { // token-less corpus: empty vocabulary
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], outSchema)
      }
      val maxLen = maxLenRow.getInt(0)
      // all observed single chars — the never-pruned coverage floor
      val chars = wc.select(explode(sequence(lit(1), length(col("_w"))))
          .as("_i"), col("_w"))
        .select(expr("substring(_w, _i, 1)").as("_piece")).distinct()
      // multi-char candidates by weighted substring frequency — kept
      // distributed, cut once (every round-1 munch step consumes it)
      val cand0 = cp.cut(chars.unionByName(
        wc.filter(length(col("_w")) >= 2)
          .select(col("_n"), explode(flatten(transform(
            sequence(lit(2), least(lit(maxPieceLen), length(col("_w")))),
            l => transform(sequence(lit(1), length(col("_w")) - l + 1),
              i => expr("_w").substr(i, l)))))
            .as("_piece"))
          .groupBy(col("_piece")).agg(sum(col("_n")).as("_f"))
          .filter(col("_f") >= minCount).select(col("_piece"))))
      val charRows = chars.collect().map(_.getString(0))
      var vocab = cand0.select(col("_piece"),
        length(col("_piece")).as("_plen"))
      var pieces: Array[String] = null
      var out: Array[Row] = null
      for (r <- 1 to rounds) {
        val cuts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val usage = segment(wc, vocab, maxPieceLen, maxLen, cp, cuts)
        if (r < rounds) {
          // prune: distributed top-T (TakeOrdered — T bounded), then
          // the ≤ alphabet + T vocabulary goes driver-side
          val kept = usage
            .filter(length(col("_piece")) > 1 && col("_usage") > 0)
            .orderBy(col("_usage").desc, col("_piece"))
            .limit(topPieces).collect().map(_.getString(0))
          pieces = (charRows ++ kept).distinct.sorted
          vocab = vocabDf(spark, pieces.toIndexedSeq)
        } else {
          // scoring round: usage of the final vocabulary's pieces
          val usageMap = vocab.join(usage, Seq("_piece"), "left")
            .select(col("_piece"), coalesce(col("_usage"), lit(0L)))
            .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
          out = pieces.map(p => Row(p, p.length, usageMap(p)))
        }
        cuts.foreach(cp.release)
        if (r == 1) cp.release(cand0)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq, 1), outSchema)
    } finally cp.release(wc)
  }

  /** Count of [[train]] invocations in this JVM — spec observability
    * for the [[TrainMemo]] one-training-per-input-per-run contract. */
  private[graft] val trainingsStarted =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** [[train]] through the per-JVM [[TrainMemo]] — the unigram twin
    * of [[Bpe.trainMemoized]]. Default hyper-parameters only: the
    * catalog family (q158/q161) trains exactly this configuration. */
  def trainMemoized(docs: DataFrame, textCol: String): DataFrame =
    TrainMemo.cached(s"unigram:$textCol", docs)(train(docs, textCol))

  /** The memoized pruned vocabulary as the piece list
    * [[encodeTokenCounts]] consumes. */
  def vocabMemoized(docs: DataFrame, textCol: String): Seq[String] =
    trainMemoized(docs, textCol).collect().map(_.getString(0)).toSeq

  /** Tokenize with a trained vocabulary: per-document piece counts —
    * the unigram twin of [[Bpe.encodeTokenCounts]], same
    * distinct-word collapse and keyed join back. Out-of-vocabulary
    * positions count as single-char unknown pieces, so every token
    * contributes. Documents with no tokens produce no row. LAZY and
    * storage-free (ShuffleBarrier cuts): safe to return from a
    * catalog query; the only build-time action is the max-word-length
    * probe that bounds the munch loop. */
  def encodeTokenCounts(docs: DataFrame, textCol: String, idCol: String,
      pieces: Seq[String], maxPieceLen: Int = 4): DataFrame = {
    require(pieces.nonEmpty)
    val spark = docs.sparkSession
    val words = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("_w"))
    val wc = ShuffleBarrier.cut(
      words.select(col("_w")).distinct().withColumn("_n", lit(1L)))
    val maxLen = wc.agg(max(length(col("_w")))).head() match {
      case row if row.isNullAt(0) => 0 // token-less corpus
      case row => row.getInt(0)
    }
    if (maxLen == 0) {
      return words.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_uni_tokens"))
    }
    val vocab = vocabDf(spark, pieces)
    // lazy chain, no per-step barrier: each munch step already ends in
    // an aggregate exchange, so ReuseExchange serves both consumers of
    // step k (step k+1's frontier and the piece-count union) from one
    // execution — a full-row repartition on top would re-shuffle every
    // step's output a second time for nothing
    val steps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var frontier = wc.select(col("_w"), col("_n"), lit(1).as("_pos"))
    for (_ <- 1 to maxLen) {
      val step = munchStep(frontier, vocab, maxPieceLen)
      steps += step.select(col("_w"))
      frontier = step
        .select(col("_w"), col("_n"), (col("_pos") + col("_len")).as("_pos"))
        .filter(col("_pos") <= length(col("_w")))
    }
    val wpc = steps.reduce(_ unionByName _)
      .groupBy(col("_w")).agg(count(lit(1)).as("_pieces"))
    words.join(wpc, "_w")
      .groupBy(col(idCol))
      .agg(sum(col("_pieces")).as("n_uni_tokens"))
  }
}
