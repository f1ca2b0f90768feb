package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (DataSketches, already on the Spark classpath):
  * mergeable distinct sketches that — unlike HLL — support set
  * INTERSECTION and difference estimates. The 100 TB use case: keep a
  * compact sketch per partition/day/segment, then answer "how many
  * distinct users did BOTH A and B see" without re-scanning either
  * side — an HLL union can only answer the OR.
  *
  * ThetaSketchAgg is a TypedImperativeAggregate — the same machinery
  * Spark's own hll_sketch_agg uses: the buffer is a live JVM Union
  * gadget that serializes (to the compact form) only at shuffle
  * boundaries, so per-row cost is one hash+update, not a
  * serialize/deserialize round trip.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType | DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg needs long/int/string/double input, got ${t.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case DoubleType => buffer.update(v.asInstanceOf[Double])
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult())
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult().toByteArray

  // compact form round-trips losslessly through a fresh union gadget
  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Distinct estimate of a serialized (compact) theta sketch. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate needs binary sketch input, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any =
    ThetaKernels.estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ThetaKernels.estimate($v);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Intersection estimate of two serialized theta sketches — the
  * operation HLL cannot express. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "theta_intersect_estimate needs two binary sketches")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.intersectEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ThetaKernels.intersectEstimate($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Row kernels shared by eval and generated code (static forwarders). */
object ThetaKernels {
  def estimate(bytes: Array[Byte]): Double =
    Sketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val it = SetOperation.builder().buildIntersection()
    it.intersect(Sketches.wrapCompactSketch(Memory.wrap(a)))
    it.intersect(Sketches.wrapCompactSketch(Memory.wrap(b)))
    it.getResult().getEstimate
  }
}

/** Column-facing API. */
object ThetaFunctions {
  private def e(c: Column): Expression = ColumnBridge.expression(c)
  def thetaSketchAgg(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(ThetaSketchAgg(e(c), lgK).toAggregateExpression())
  def thetaEstimate(c: Column): Column =
    ColumnBridge.column(ThetaEstimate(e(c)))
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersectEstimate(e(a), e(b)))
}
