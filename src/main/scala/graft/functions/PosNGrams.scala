package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function (UDTF): one input row → one output row
  * per word n-gram, with its 0-based token position. The positional
  * form is what n-gram *span* consumers need (exact-substring dedup
  * cut points, contamination span reporting) — `Shingles` only yields
  * the distinct set.
  *
  * A native Catalyst `Generator` (not a flatMap over Datasets): it
  * plugs into `GenerateExec`, so the planner keeps column pruning and
  * pushdown around it, and SQL callers get the standard
  * `LATERAL VIEW pos_ngrams(text, n)` syntax via the
  * [[GraftExtensions]] registration.
  */
case class PosNGrams(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with CodegenFallback {

  require(n >= 1, s"n must be >= 1 (got $n)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("pos_ngrams needs string input")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val toks = v.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Nil
    (0 to toks.length - n).map { i =>
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      InternalRow(i, UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
