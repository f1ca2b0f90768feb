package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join WITHOUT an equi key: left rows join right rows
  * whose time falls inside `[l.ts, l.ts + len)`.
  *
  * The reference has no range join (SURVEY §2.4 "not present"); this is
  * the scale-path extension. Spark plans a bare range predicate as
  * BroadcastNestedLoopJoin — O(n·m) compares and a broadcast of a whole
  * side, which dies at 100 TB. The classic fix (cf. interval joins in
  * Flink, range-join binning in Trino/Databricks SQL) is BINNING:
  * quantize time into bins of the interval length; a right row at time t
  * can only match left rows whose interval start lands in bin(t) or
  * bin(t)-1, so exploding the left side into the ≤2 bins its interval
  * touches turns the range join into an EQUI join on the bin plus an
  * exact residual filter. One hash-partitioned shuffle on `_bin`, no
  * broadcast of the big side, skew bounded by rows-per-bin — this is the
  * plan that survives a 100× scale-up.
  */
object RangeJoin {

  /** Join rows of `left` to rows of `right` with
    * `right[rightTsUs] ∈ [ left[leftTsUs], left[leftTsUs] + lenUs )`.
    * Timestamp columns are long microseconds. Binning MUST be integral
    * (`div`): double division rounds at the 2^53 mantissa edge and can
    * mis-bin boundary rows (epoch-µs ≈ 1.7e15). Bin width = lenUs, so
    * each left interval spans exactly 2 bins.
    * Output: all left columns + all right columns (caller projects). */
  def intervalJoin(left: DataFrame, leftTsUs: String,
      right: DataFrame, rightTsUs: String, lenUs: Long): DataFrame = {
    require(lenUs > 0, s"interval length must be positive (got $lenUs)")
    val lBin = expr(s"`$leftTsUs` div ${lenUs}L")
    val l = left.withColumn("_bin", explode(array(lBin, lBin + 1)))
    val r = right.withColumn("_bin", expr(s"`$rightTsUs` div ${lenUs}L"))
    l.join(r, Seq("_bin"))
      .filter(col(rightTsUs) >= col(leftTsUs)
        && col(rightTsUs) < col(leftTsUs) + lenUs)
      .drop("_bin")
  }
}
