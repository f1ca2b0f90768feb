package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — fusing a sparse (BM25) ranking with a dense
  * (embedding-cosine) ranking, the standard first-stage layout of a
  * RAG / curation retrieval stack. The fusion operates on top-n
  * bounded rankings only: at any corpus size the inputs are n rows
  * (a user constant), so every join and window below is MB-scale no
  * matter how large the corpus that produced the rankings was.
  */
object Retrieval {

  /** Hard-negative mining for retrieval/embedding training (the
    * DPR/Contriever data recipe): for each query vector, the top-`k`
    * most-cosine-similar candidates whose GROUP differs from the
    * query's — same-group hits (the document's own source, a near-dup
    * cluster, a known-positive set) are excluded at the pair level,
    * because they are presumed positives and training on them as
    * negatives poisons the contrastive loss. Returns
    * (q_id, neg_id, rank), rank 1 = hardest negative.
    *
    * Scale shape: mining batches are bounded (queries broadcast);
    * candidates stream through the pair filter into the bounded
    * per-query rank — [[Similarity.bruteForceTopK]]'s discipline with
    * a group anti-predicate fused before the kernel, so excluded
    * pairs never pay the dot product. At 10^9 candidates swap the
    * feed for an ANN probe (IVF cells) and keep this as the in-cell
    * scorer; the exact form is the oracle-checkable contract. */
  def hardNegatives(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k > 0)
    val dotF = graft.functions.VectorFunctions.dot _
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).as("_qv"), col(groupCol).as("_qg"),
      dotF(col(vecCol), col(vecCol)).as("_qn"))
    val c = candidates.select(col(idCol).as("n_id"),
      col(vecCol).as("_cv"), col(groupCol).as("_cg"),
      dotF(col(vecCol), col(vecCol)).as("_cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id") && col("_qg") =!= col("_cg"))
      .withColumn("cos",
        dotF(col("_qv"), col("_cv")) / sqrt(col("_qn") * col("_cn")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id").as("neg_id"), col("rank"))
  }

  /** Global top-n of `df` by (scoreCol desc, idCol asc) with a 1-based
    * rank. The top-n is `orderBy.limit` — Spark plans a
    * TakeOrderedAndProject (per-partition heap + driver merge of n·P
    * rows), never a global sort — and the rank window then runs over
    * the n survivors only, so its single-partition shape is bounded
    * by the constant n, not the corpus. */
  def rankTopN(df: DataFrame, idCol: String, scoreCol: String,
      n: Int): DataFrame = {
    require(n > 0)
    df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(n)
      .withColumn("rank", row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol).asc)))
      .select(col(idCol), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two (id, rank)
    * rankings: rrf(id) = 1/(k0 + rank_sparse) + 1/(k0 + rank_dense),
    * with an absent id contributing 0 from that side. Returns the
    * fused top-`topK` as (id, rrf, fused_rank), ties broken by id.
    *
    * Engine-exact doubles: k0 + rank is an exact small integer in a
    * double, each reciprocal is one correctly-rounded IEEE division,
    * and the two terms add in fixed left-to-right order — so an
    * external engine replays rrf bit-for-bit. */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, idCol: String,
      k0: Int = 60, topK: Int = 10): DataFrame = {
    require(k0 >= 0 && topK > 0)
    val s = sparse.select(col(idCol), col("rank").as("_rs"))
    val d = dense.select(col(idCol), col("rank").as("_rd"))
    s.join(d, Seq(idCol), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0.toDouble) + col("_rs").cast("double")),
          lit(0.0))
          + coalesce(lit(1.0) / (lit(k0.toDouble) + col("_rd").cast("double")),
            lit(0.0)))
      .orderBy(col("rrf").desc, col(idCol).asc).limit(topK)
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("rrf").desc, col(idCol).asc)))
      .select(col(idCol), col("rrf"), col("fused_rank"))
  }
}
