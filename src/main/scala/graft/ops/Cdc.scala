package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC (change-data-capture) apply: collapse an ordered I/U/D change
  * feed to the final snapshot — the general form of the reference's
  * upsert (which has no deletes, gluejob.py:197-198).
  *
  * One window shuffle on the key (same profile as [[Upsert.merge]]'s
  * precedence window): rank versions per key by the sequence columns
  * descending, keep rank 1, drop keys whose final operation is a
  * delete. The seq columns MUST totally order versions of a key —
  * a tie would make "latest" nondeterministic across retries.
  */
object Cdc {

  /** `opCol` values: 'I' (insert), 'U' (update), 'D' (delete). */
  def applyLatest(feed: DataFrame, key: String, seqCols: Seq[String],
      opCol: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(seqCols.map(col(_).desc): _*)
    feed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "D")
      .drop("_rn")
  }
}
