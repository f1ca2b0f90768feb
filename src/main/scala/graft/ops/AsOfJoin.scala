package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for each left row, the single right row
  * with the greatest right timestamp ≤ the left timestamp, per key.
  *
  * Spark has no native as-of join; a naive range join is O(n·m) per
  * key. This composes built-ins instead (preference (a) of the custom-
  * operator ladder): tag both sides, union, and take a running
  * `last(..., ignoreNulls)` over (key, time, tag) ordering — ONE
  * shuffle on the key, linear in rows, AQE-friendly, and it never
  * materializes candidate pairs. Right rows sort before left rows at
  * equal timestamps, giving `>=` (inclusive) semantics.
  */
object AsOfJoin {

  /** Attach `asCol` = `rightVal` from the latest right row at or before
    * each left row's `_ts`, per `keys`. Left rows keep all columns;
    * unmatched left rows get null. `tiebreak` must exist on both sides
    * and make (ts, tag, tiebreak) a total order per key. */
  def asOfPrior(left: DataFrame, leftTs: String, right: DataFrame,
      rightTs: String, keys: Seq[String], rightVal: String,
      asCol: String, tiebreak: String): DataFrame = {
    val valType = right.schema(rightVal).dataType
    val payloadT = StructType(left.schema.fields)
    val l = left.select(
      (struct(left.columns.map(col): _*).as("_payload") +:
        keys.map(col)) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_tag"),
        lit(null).cast(valType).as("_rv"),
        col(tiebreak).as("_tb")): _*)
    val r = right.select(
      (lit(null).cast(payloadT).as("_payload") +:
        keys.map(col)) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_tag"),
        col(rightVal).as("_rv"),
        col(tiebreak).as("_tb")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_tag").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asCol, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_payload.*"), col(asCol))
  }
}
