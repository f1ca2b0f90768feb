package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Whole-operator custom plan for exact top-k cosine similarity — the
  * (c) rung of the custom-operator ladder: LogicalPlan + SparkStrategy
  * + SparkPlan, registered through SparkSessionExtensions
  * (graft.functions.GraftExtensions).
  *
  * Why a custom operator: the composed plan (cross join → window
  * row_number → filter) materializes |queries|×|candidates| scored rows
  * into a rank shuffle. This operator keeps a bounded k-heap per query
  * per partition and merges heaps — no shuffle at all, O(k·|queries|)
  * partial state per partition, single scan of the candidates. At 10^9
  * candidates the composed plan shuffles billions of rows; this one
  * tree-aggregates the partials on the executors and hands the driver a
  * single |queries| × k merge (partition count never reaches the driver).
  *
  * Children contract: both sides project exactly (id: bigint,
  * vec: array<float>). Cosine is the same pinned sequential double fold
  * as graft.functions.DotProduct, so results hash-match the same DuckDB
  * oracle as the composed implementation.
  */
case class SimilarityTopK(k: Int, queries: LogicalPlan,
    candidates: LogicalPlan, output: Seq[Attribute]) extends BinaryNode {
  override def left: LogicalPlan = queries
  override def right: LogicalPlan = candidates
  // the node GENERATES its output attributes (they are not derived from
  // child output) — without this the planner flags missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the operator consumes EVERY child column; without this the default
  // (expression-derived, here empty) references let ColumnPruning strip
  // the children to zero-field rows
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      queries.output ++ candidates.output)
  override protected def withNewChildrenInternal(l: LogicalPlan,
      r: LogicalPlan): LogicalPlan = copy(queries = l, candidates = r)
}

object SimilarityTopK {
  /** Output attributes are minted ONCE here and carried as a field:
    * a `val output` re-mints exprIds on every copy()/transform, which
    * silently invalidates any parent operator's references. */
  def apply(k: Int, queries: LogicalPlan,
      candidates: LogicalPlan): SimilarityTopK =
    SimilarityTopK(k, queries, candidates, Seq(
      AttributeReference("q_id", LongType, nullable = false)(),
      AttributeReference("n_id", LongType, nullable = false)(),
      AttributeReference("rank", IntegerType, nullable = false)()))
}

object SimilarityTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: SimilarityTopK =>
      SimilarityTopKExec(p.k, p.output, planLater(p.queries),
        planLater(p.candidates)) :: Nil
    case _ => Nil
  }
}

case class SimilarityTopKExec(k: Int, output: Seq[Attribute],
    queries: SparkPlan, candidates: SparkPlan) extends BinaryExecNode {

  override def left: SparkPlan = queries
  override def right: SparkPlan = candidates
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildrenInternal(l: SparkPlan,
      r: SparkPlan): SparkPlan = copy(queries = l, candidates = r)

  /** Sequential double fold — identical arithmetic to DotProduct. */
  private def dotF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  override protected def doExecute(): RDD[InternalRow] = {
    // small side to the driver, norms precomputed once (standard
    // broadcast-build pattern, cf. BroadcastExchangeExec)
    require(queries.output.nonEmpty && candidates.output.nonEmpty,
      "SimilarityTopK children were pruned to zero columns")
    val qRows = queries.executeCollect().map { r =>
      val v = r.getArray(1).toFloatArray
      (r.getLong(0), v, dotF(v, v))
    }
    val bc = sparkContext.broadcast(qRows)
    val kk = k

    // per-partition bounded heaps: one scan, no shuffle
    val partials = candidates.execute().mapPartitions { iter =>
      val qs = bc.value
      // min-heap per query on (cos asc, n_id desc) so the worst kept
      // entry is on top; ordering ties broken toward keeping lower ids
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
          Ordering.by[(Double, Long), (Double, Long)] {
            case (c, id) => (-c, id)
          }))
      iter.foreach { row =>
        val nId = row.getLong(0)
        val v = row.getArray(1).toFloatArray
        val nn = dotF(v, v)
        var qi = 0
        while (qi < qs.length) {
          val (qId, qv, qn) = qs(qi)
          if (nId != qId) {
            val cos = dotF(qv, v) / math.sqrt(qn * nn)
            val h = heaps(qi)
            if (h.size < kk) h.enqueue((cos, nId))
            else {
              val (wc, wid) = h.head
              if (cos > wc || (cos == wc && nId < wid)) {
                h.dequeue(); h.enqueue((cos, nId))
              }
            }
          }
          qi += 1
        }
      }
      Iterator.single(heaps.map(_.dequeueAll.toArray))
    }

    // tree-merge the per-partition partials on the EXECUTORS: top-k
    // selection under the total order (-cos, id) is associative, so
    // pairwise merge-and-truncate loses nothing. The driver receives
    // exactly ONE |queries|×k partial — partition count never appears
    // in driver memory (a flat collect would hold
    // #partitions × |queries| × k tuples and OOM on wide query sets).
    def mergeTopK(a: Array[Array[(Double, Long)]],
        b: Array[Array[(Double, Long)]]): Array[Array[(Double, Long)]] = {
      val out = new Array[Array[(Double, Long)]](a.length)
      var qi = 0
      while (qi < a.length) {
        out(qi) = (a(qi) ++ b(qi))
          .sortBy { case (c, id) => (-c, id) }.take(kk)
        qi += 1
      }
      out
    }
    val zero = Array.fill(qRows.length)(Array.empty[(Double, Long)])
    val best = partials.treeAggregate(zero)(mergeTopK, mergeTopK)

    val merged = qRows.indices.flatMap { qi =>
      best(qi).zipWithIndex.map { case ((_, nId), rank) =>
        (qRows(qi)._1, nId, rank + 1)
      }
    }
    sparkContext.parallelize(merged, 1).mapPartitions { it =>
      val p = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](
        LongType, LongType, IntegerType))
      it.map { case (q, n, r) =>
        p(InternalRow(q, n, r)).copy(): InternalRow
      }
    }
  }
}

/** Optimizer rule (injected via SparkSessionExtensions): predicates on
  * `q_id` above a SimilarityTopK commute with the operator (each
  * query's top-k is independent), so they push into the QUERIES child
  * — from where Catalyst pushes them all the way into the scan. The
  * difference at scale: filter-then-search touches only the asked-for
  * queries instead of searching for all and discarding. */
object PushFilterThroughSimilarityTopK
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, topk: SimilarityTopK) =>
      val qId = topk.output.head // q_id
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(AttributeSet(qId :: Nil)))
      if (push.isEmpty) f
      else {
        val childId = topk.queries.output.head
        val rewritten = push.map(_.transform {
          case a: Attribute if a.semanticEquals(qId) => childId
        })
        val newTopk = topk.copy(queries =
          Filter(rewritten.reduce(And), topk.queries))
        keep.reduceOption(And).map(Filter(_, newTopk)).getOrElse(newTopk)
      }
  }
}
