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

  /** `opCol` values: 'I' (insert), 'U' (update), 'D' (delete). A NULL
    * op refuses at execution (`raise_error` inside the keep-filter —
    * no extra census job over the feed): the naive `op =!= 'D'`
    * filter evaluates null → null → row DROPPED, so a dirty feed's
    * null-op rows would silently behave as deletes instead of
    * surfacing the upstream bug. */
  def applyLatest(feed: DataFrame, key: String, seqCols: Seq[String],
      opCol: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(seqCols.map(col(_).desc): _*)
    val keep = when(col(opCol).isNull,
      raise_error(lit(s"op column '$opCol' is null — the contract is " +
        "'D' = delete, anything else upserts; a null op would " +
        "silently delete")).cast("boolean"))
      .otherwise(col(opCol) =!= "D")
    feed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && keep)
      .drop("_rn")
  }
}
