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
  * Scale shape: the feature table is built once, laid out by doc id
  * behind one keyed barrier; each round then costs one BROADCAST join
  * of the ≤`dim`-row weight table (no corpus shuffle — margins group
  * on the barrier's own layout), one map-side-combined gradient
  * aggregation (≤ dim rows per partition reach the exchange), and a
  * dim-bounded full-outer weight merge. Rounds chain lazily behind
  * per-round keyed barriers, so a catalog query returns the whole fit
  * storage-free and plan size stays LINEAR in rounds (without the
  * barrier each round references the previous weights twice and the
  * tree doubles per round). */
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

  /** One perceptron round: broadcast-score every doc against `w`,
    * collect the misclassified set (y·score ≤ 0), add the summed
    * y·count gradient. `ft` must be laid out by _id so the margin
    * grouping and the gradient's doc join both inherit its layout. */
  private def step(ft: DataFrame, w: DataFrame): DataFrame = {
    val mis = ft
      .join(broadcast(w), Seq("_f"), "left")
      .groupBy(col("_id"), col("_y"))
      .agg(sum(coalesce(col("weight"), lit(0L)) * col("_c")).as("_p"))
      .filter(col("_y") * col("_p") <= 0)
      .select(col("_id"))
    val grad = ft.join(mis, Seq("_id"))
      .groupBy(col("_f")).agg(sum(col("_y") * col("_c")).as("_g"))
    // USING full-outer join: Spark emits the coalesced _f itself
    w.join(grad, Seq("_f"), "full")
      .select(col("_f"),
        (coalesce(col("weight"), lit(0L))
          + coalesce(col("_g"), lit(0L))).as("weight"))
  }

  /** Train `rounds` exact batch-perceptron rounds; returns
    * (feature, weight) — only touched feature buckets appear. Lazy
    * and storage-free: safe to return from a catalog query. Round 1
    * against the zero vector marks every doc misclassified, so
    * w₁[f] = Σ y·count — the oracle replays it as a plain aggregate
    * and each later round as score→filter→gradient CTEs. */
  def perceptronTrain(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, dim: Int = 256, rounds: Int = 3): DataFrame = {
    require(dim > 0 && rounds >= 1)
    val ft = ShuffleBarrier.cutShared(
      hashedFeatures(docs, textCol, idCol, labelCol, dim), Seq("_id"))
    var w = ShuffleBarrier.cutShared(
      ft.groupBy(col("_f")).agg(sum(col("_y") * col("_c")).as("weight")),
      Seq("_f"))
    for (_ <- 2 to rounds)
      w = ShuffleBarrier.cutShared(step(ft, w), Seq("_f"))
    w.select(col("_f").as("feature"), col("weight"))
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
