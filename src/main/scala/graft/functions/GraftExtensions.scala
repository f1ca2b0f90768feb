package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions registering the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same
  * kernels as the DataFrame API:
  *
  *   dot_product(a, b)           jaccard_sim(a, b)
  *   jaccard_sorted_sim(a, b)    sim_hash64(text)
  *   min_hash_sig(shingles, numPerms, seed)
  *   shingles(text, n, word)
  *
  * Activate with .config("spark.sql.extensions",
  * "graft.functions.GraftExtensions") or builder.withExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Number, _) => v.intValue()
    case _ => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $e")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Number, _) => v.longValue()
    case _ => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $e")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case _ => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $e")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.SimilarityTopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughSimilarityTopK)
    e.injectOptimizerRule(_ => graft.plans.RewriteRangeJoinAsBinned)
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("jaccard_sim"),
      info("jaccard_sim"),
      (args: Seq[Expression]) => JaccardSim(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("jaccard_sorted_sim"),
      info("jaccard_sorted_sim"),
      (args: Seq[Expression]) => JaccardSortedSim(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("sim_hash64"),
      info("sim_hash64"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    e.injectFunction((FunctionIdentifier("min_hash_sig"),
      info("min_hash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        if (args.length > 1) intArg(args(1), "numPerms") else 32,
        if (args.length > 2) longArg(args(2), "seed") else 42L)))
    e.injectFunction((FunctionIdentifier("shingles"),
      info("shingles"),
      (args: Seq[Expression]) => Shingles(args(0),
        intArg(args(1), "n"),
        if (args.length > 2) boolArg(args(2), "word") else true)))
    e.injectFunction((FunctionIdentifier("zorder64"),
      info("zorder64"),
      (args: Seq[Expression]) => ZOrder64(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("pos_ngrams"),
      info("pos_ngrams"),
      (args: Seq[Expression]) => PosNGrams(args(0), intArg(args(1), "n"))))
    e.injectFunction((FunctionIdentifier("theta_sketch_agg"),
      info("theta_sketch_agg"),
      (args: Seq[Expression]) => ThetaSketchAgg(args(0),
        if (args.length > 1) intArg(args(1), "lgK") else 12)
        .toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("theta_estimate"),
      info("theta_estimate"),
      (args: Seq[Expression]) => ThetaEstimate(args(0))))
    e.injectFunction((FunctionIdentifier("theta_intersect_estimate"),
      info("theta_intersect_estimate"),
      (args: Seq[Expression]) => ThetaIntersectEstimate(args(0), args(1))))
  }
}
