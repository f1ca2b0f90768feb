package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row: `value` ranks (desc), `id` breaks ties (asc) so the
  * result is deterministic under any partitioning/merge order. */
final case class Scored(value: Double, id: Long)

/** Typed `Aggregator` top-k by value — the §2.9 UDAF surface.
  *
  * The window alternative (`row_number over (partition by g order by
  * v)`, q10) shuffles and SORTS every row of every group; this
  * aggregator carries a bounded k-element buffer through map-side
  * partial aggregation, so the shuffle moves k rows per group per map
  * partition instead of the whole table — at 100 TB that is the
  * difference between a top-3 costing a full sort and costing a scan.
  *
  * Buffer is an always-sorted Seq (k is small; insertion is O(k)).
  * `merge` is associative + commutative, as partial aggregation
  * requires.
  */
final class TopKByValue(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  private def better(a: Scored, b: Scored): Boolean =
    a.value > b.value || (a.value == b.value && a.id < b.id)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.size < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sortWith(better).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}

object TopKByValue {
  /** Column-world handle: `topK(3)(col("value"), col("event_id"))`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByValue(k),
      Encoders.product[Scored])
}
