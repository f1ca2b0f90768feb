package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the classifier stage of
  * CCNet-descendant pipelines (a fastText-style linear model over
  * hashed bag-of-words features, trained to separate "good" from
  * "bad" text, then swept over the corpus as a gate). This engine
  * trains the model IN Spark with EXACT integer arithmetic so the
  * whole fit — every round's margins, misclassified set, and weight
  * update — replays bit-for-bit in an external engine (the q147/q158
  * tokenizer-training discipline applied to model training):
  *
  *  - features: the portable rolling-poly token hash (the q118 chain)
  *    bucketed mod `dim` — the fastText hashing trick, no vocabulary
  *    to ship;
  *  - model: averaged-free batch perceptron. Round r scores every doc
  *    with integer weights, takes the docs with `y·score ≤ 0`
  *    (misclassified, zero-margin counts), and adds the summed
  *    `y·count` gradient — all Long sums, no learning-rate division,
  *    no floats anywhere;
  *  - labels: caller-provided ±1 — the catalog distills the published
  *    Gopher rule gate (q152) into the model, the
  *    weak-supervision/distillation recipe real pipelines use when no
  *    human labels exist.
  *
  * Scale shape: the feature table is built once, checkpoint-cut, and
  * released before return; each round is one distributed pass — a
  * BROADCAST join of the ≤`dim`-row weight table (no corpus shuffle),
  * the margin grouping, and one map-side-combined gradient
  * aggregation (≤ dim rows per partition reach the exchange) — ending
  * in a dim-bounded driver collect, the model-sync step of every
  * distributed training loop. The returned fit is a detached
  * LocalRelation, so nothing cluster-side outlives the call. */
object Classifier {

  /** Sparse hashed features (_id, _y, _f, _c): one row per (doc,
    * feature bucket), count-valued. Map-only until the single keyed
    * aggregation; the token string never leaves the scan — only its
    * portable poly hash rides the shuffle. */
  def hashedFeatures(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, dim: Int): DataFrame =
    docs.select(col(idCol).as("_id"), col(labelCol).as("_y"),
        explode(graft.functions.VectorFunctions.polyHashAll(
          TextAnalysis.tokens(col(textCol)))).as("_h"))
      .select(col("_id"), col("_y"), pmod(col("_h"), lit(dim.toLong)).as("_f"))
      .groupBy(col("_id"), col("_y"), col("_f"))
      .agg(count(lit(1)).as("_c"))

  /** Train `rounds` exact batch-perceptron rounds; returns
    * (feature, weight) — only touched feature buckets appear, as a
    * DETACHED LocalRelation (the [[Bpe.train]]/[[Unigram.train]]
    * convention: model parameters are driver-small BY CONSTRUCTION —
    * the hashing trick bounds them at `dim` rows — so each round
    * syncs the weight table through the driver, which is the model-
    * sync step of every distributed training loop). Round 1 against
    * the zero vector marks every doc misclassified, so w₁[f] =
    * Σ y·count — the oracle replays it as a plain aggregate and each
    * later round as score→filter→gradient CTEs.
    *
    * The feature table is built once, cut with the [[Checkpointer]]
    * discipline, and released before return; each round is ONE
    * distributed pass (margins → misclassified → gradient) ending in
    * a ≤dim-row collect. A fully-lazy weight recurrence was measured
    * first and rejected: each round references the previous weights
    * twice (scoring + merge), so the composed plan doubled per round
    * (~100 exchange/scan nodes at 3 rounds) and re-planning cost grew
    * with the corpus. */
  def perceptronTrain(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, dim: Int = 256, rounds: Int = 3,
      cp: Checkpointer = LocalCheckpoint): DataFrame = {
    require(dim > 0 && rounds >= 1)
    val spark = docs.sparkSession
    val ft = cp.cut(
      hashedFeatures(docs, textCol, idCol, labelCol, dim))
    try {
      var w: Map[Long, Long] = ft
        .groupBy(col("_f")).agg(sum(col("_y") * col("_c")).as("w"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (_ <- 2 to rounds) {
        val wdf = spark.createDataFrame(asJava(w.toSeq.sorted.map {
          case (f, wt) => org.apache.spark.sql.Row(f, wt) }),
          weightSchema("_wt"))
        val mis = ft
          .join(broadcast(wdf), Seq("_f"), "left")
          .groupBy(col("_id"), col("_y"))
          .agg(sum(coalesce(col("_wt"), lit(0L)) * col("_c")).as("_p"))
          .filter(col("_y") * col("_p") <= 0)
          .select(col("_id"))
        val grad = ft.join(mis, Seq("_id"))
          .groupBy(col("_f")).agg(sum(col("_y") * col("_c")).as("_g"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        w = grad.foldLeft(w) { case (acc, (f, g)) =>
          acc.updated(f, acc.getOrElse(f, 0L) + g) }
      }
      spark.createDataFrame(asJava(w.toSeq.sorted.map {
        case (f, wt) => org.apache.spark.sql.Row(f, wt) }),
        weightSchema("weight"))
        .withColumnRenamed("_f", "feature")
    } finally cp.release(ft)
  }

  private def weightSchema(valueName: String) =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_f",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(valueName,
        org.apache.spark.sql.types.LongType, nullable = false)))

  private def asJava[T](s: Seq[T]): java.util.List[T] = {
    val l = new java.util.ArrayList[T](s.size)
    s.foreach(l.add)
    l
  }

  /** Sweep a trained weight table over a corpus: per-doc integer
    * score and the `score > 0` keep bit. Broadcast join only — the
    * corpus is never shuffled wider than its own feature grouping. */
  def perceptronScore(docs: DataFrame, textCol: String, idCol: String,
      weights: DataFrame, dim: Int = 256): DataFrame =
    docs.select(col(idCol).as("_id"),
        explode(graft.functions.VectorFunctions.polyHashAll(
          TextAnalysis.tokens(col(textCol)))).as("_h"))
      .select(col("_id"), pmod(col("_h"), lit(dim.toLong)).as("_f"))
      .groupBy(col("_id"), col("_f")).agg(count(lit(1)).as("_c"))
      .join(broadcast(weights.select(col("feature").as("_f"),
        col("weight"))), Seq("_f"), "left")
      .groupBy(col("_id"))
      .agg(sum(coalesce(col("weight"), lit(0L)) * col("_c")).as("score"))
      .select(col("_id").as("doc_id"), col("score"),
        (col("score") > 0).as("keep"))
}
