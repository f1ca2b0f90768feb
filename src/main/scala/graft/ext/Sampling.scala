package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture sampling — re-weighting a corpus to target domain
  * proportions (the "data mixing" step before pretraining). Given
  * target weights per domain, the sampler computes the largest total
  * the corpus can serve without upsampling (`scale = min_d count_d /
  * w_d` — the binding domain is kept whole) and keeps exactly
  * `floor(w_d * scale)` rows per domain, chosen by a deterministic
  * Knuth-multiplicative hash rank so any engine replays the identical
  * subset. Domains absent from the weight map are dropped.
  *
  * Shapes: the count and quota sides are domain-cardinality-tiny
  * (broadcast); the data side pays one per-domain rank window. Exact
  * quotas need that per-domain ordering — at extreme skew trade
  * exactness for a map-only hash-threshold filter (`h < rate * 2^31`,
  * quota ± binomial noise) as q67 does for fixed rates.
  *
  * A domain present in the weight map but absent from the data simply
  * contributes no rows (the quota join is inner): the other domains'
  * quotas still honor THEIR weights against the feasible scale, so the
  * realized mixture is the target renormalized over present domains.
  */
object Sampling {

  /** 31-bit Knuth hash of a non-negative id — masked before the
    * multiply so products stay in Long (q67's overflow discipline). */
  private def hash31(id: org.apache.spark.sql.Column) =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(2147483647L))

  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0))
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.sortBy(_._1).toDF(domainCol, "_wt")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_c"))
      .join(broadcast(wdf), domainCol)
    val scale = counts.agg(min(col("_c").cast("double") / col("_wt")).as("_scale"))
    val quotas = counts.crossJoin(broadcast(scale))
      .select(col(domainCol), floor(col("_wt") * col("_scale")).as("_keep"))
    df.select(col(idCol), col(domainCol))
      .join(broadcast(quotas), domainCol)
      .withColumn("_rn", row_number().over(Window.partitionBy(col(domainCol))
        .orderBy(hash31(col(idCol)), col(idCol))))
      .filter(col("_rn") <= col("_keep"))
      .select(col(idCol), col(domainCol))
  }
}
