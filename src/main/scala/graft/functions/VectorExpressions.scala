package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot per-row kernels.
  *
  * The built-in route (zip_with/aggregate/array_intersect) evaluates an
  * interpreted expression tree per ELEMENT, and Catalyst's project
  * collapse can re-evaluate a whole array expression once per consumer.
  * These expressions run one tight JVM loop per ROW instead — the
  * arithmetic (sequential double fold) is exactly the one the DuckDB
  * oracle replays, so swapping them in changes nothing numerically.
  */

/** Sequential-fold dot product of two float/double arrays in double.
  * Whole-stage-codegen'd: the generated code is a plain for-loop.
  * Array elements are assumed non-null; result is null if either array
  * is null. Unequal lengths fold over the common prefix. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left) && okElem(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) { $s += ($getA) * ($getB); }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Squared L2 distance over one PQ subspace — elements [offset,
  * offset+len) of both arrays, 0-based — as the same strictly
  * sequential double fold the interpreted
  * `aggregate(sequence(...))` HOF runs (bitwise-identical results, so
  * the DuckDB oracles are unaffected), but in whole-stage codegen:
  * higher-order functions drop the surrounding stage out of codegen
  * and re-enter the interpreter per row, which at nCodewords x nSub
  * evaluations per vector is the PQ hot path. Short arrays clamp to
  * their length (preconditions upstream guarantee full `dim`). */
case class SubspaceL2(left: Expression, right: Expression,
    offset: Int, len: Int) extends BinaryExpression {

  private def okElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left) && okElem(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"subspace_l2 needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(offset + len, math.min(x.numElements(), y.numElements()))
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = offset
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($offset + $len,
          java.lang.Math.min($a.numElements(), $b.numElements()));
        double $s = 0.0;
        for (int $i = $offset; $i < $n; $i++) {
          double $d = ($getA) - ($getB);
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Exact Jaccard similarity of two string arrays (each pre-distinct) in
  * ONE pass: hash-set of the smaller side, probe with the larger.
  * Replaces size(array_intersect)/inclusion-exclusion trees that
  * re-build hash sets per consumer. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("jaccard_sim needs array<string>")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardHash(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.jaccardHash($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** MinHash signature over shingles: sig[j] = min over shingles s of
  * (a_j*hash(s) + b_j) mod p, p = 2^31-1. Accepts either raw
  * array<string> shingles (hashed in-loop via xxhash64 seed 42, then
  * pmod — identical to pmod(xxhash64(s), p)) or pre-hashed array<long>.
  * One Scala loop instead of numPerms interpreted array traversals. */
case class MinHashSig(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "min_hash_sig needs array<long> or array<string>")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isString =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType
  private lazy val (as, bs) = MinHashSig.perms(numPerms, seed)

  override def nullSafeEval(v: Any): Any =
    TextKernels.minHashSig(v.asInstanceOf[ArrayData], isString, as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.minHashSig(" +
        s"$v, $isString, $asRef, $bsRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSig {
  val P = 2147483647L

  /** The seeded permutation constants sig[j] = min (a_j*h + b_j) mod P.
    * Public so an oracle replaying the signature can embed the exact
    * same (a_j, b_j) literals. */
  def perms(numPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    val r = new scala.util.Random(seed)
    val a = new Array[Long](numPerms); val b = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) {
      a(i) = math.abs(r.nextLong()) % (P - 1) + 1
      b(i) = math.abs(r.nextLong()) % P
      i += 1
    }
    (a, b)
  }
}

/** 64-bit SimHash over the whitespace tokens of a string: per bit, sign
  * of the +1/-1 sum across token xxhash64 bits. Tokenization matches
  * TextAnalysis.tokens (split \s+, drop empties); hash matches
  * Spark's xxhash64 (XXH64, seed 42). */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("sim_hash64 needs string")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    TextKernels.simHash64(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.simHash64($v);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Portable SimHash fingerprint over an array<long> of token hashes
  * (the [[PolyHashArray]] output): bit j = majority vote of bit 0 of
  * the j-th seeded affine reshuffle (a_j·h + b_j) mod 2^31−1, the same
  * (a_j, b_j) family [[MinHashSig]] draws — so an external engine
  * rebuilds the identical fingerprint from the public constants, where
  * [[SimHash64]]'s xxhash64 lanes are engine-internal. One JVM loop
  * per row, codegen via [[TextKernels.simHashPoly]]. */
case class SimHashPoly(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {

  require(nBits > 0 && nBits <= 62, s"nBits must be in [1, 62], got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sim_hash_poly needs array<long>")
  }
  override def dataType: DataType = LongType

  private lazy val (as, bs) = MinHashSig.perms(nBits, seed)

  override def nullSafeEval(v: Any): Any =
    TextKernels.simHashPoly(v.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("shAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("shBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.simHashPoly(" +
        s"$v, $asRef, $bsRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One BPE merge application over an array<string> symbol sequence:
  * greedy left-to-right replacement of adjacent (left, right) with
  * their concatenation, one JVM loop per row via
  * [[TextKernels.bpeMergeStep]]. The tokenizer-training inner step —
  * a HOF fold with struct state would leave whole-stage codegen and
  * re-interpret per element. */
case class BpeMerge(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bpe_merge needs (array<string>, string, string)")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any, l: Any, r: Any): Any =
    TextKernels.bpeMergeStep(a.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, l, r) =>
      s"${ev.value} = graft.functions.TextKernels.bpeMergeStep($a, $l, $r);")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** T5-style span-corruption rendering over (tokens, mask flags): the
  * input side or the target side per `targets`, via
  * [[TextKernels.spanCorrupt]] — one codegen loop instead of a
  * windowed run-index + conditional string_agg pipeline per side. */
case class SpanCorrupt(left: Expression, right: Expression,
    targets: Boolean) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(BooleanType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "span_corrupt needs (array<string>, array<boolean>)")
    }
  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any, m: Any): Any =
    TextKernels.spanCorrupt(a.asInstanceOf[ArrayData],
      m.asInstanceOf[ArrayData], targets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) =>
      s"${ev.value} = graft.functions.TextKernels.spanCorrupt($a, $m, $targets);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Exact Jaccard of two SORTED string arrays via allocation-free merge
  * intersection (binary UTF8String order, as produced by sort_array).
  * Same value as JaccardSim; preferred in pair loops — no per-pair
  * hash-set allocation, so no GC churn at millions of pairs. */
case class JaccardSortedSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("jaccard_sorted needs array<string>")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.jaccardSorted($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Argmax-cosine coarse-quantizer assignment: fold over a PACKED
  * centroid array (one broadcast row of struct<id: long, v:
  * array<float|double>, n: double>, sorted ascending by id) and return
  * struct(cell, sim) for the nearest centroid by cosine, ties to the
  * lowest id. Numerically identical to exploding (vector × centroid)
  * pairs and ranking with `row_number` — dot and the vector norm are
  * the same sequential double folds as [[DotProduct]], sim =
  * dot/sqrt(nv·nc) — but with no ×nCells row expansion and NO shuffle:
  * the whole assignment is one codegen'd projection over the corpus
  * scan. NaN sims rank above everything (Spark/DuckDB descending-sort
  * semantics), equal sims keep the earlier (lower-id) centroid. */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okElem(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 3 && fs(0).dataType == LongType &&
          okElem(fs(1).dataType) && fs(2).dataType == DoubleType &&
          okElem(left.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "nearest_centroid needs (array<float|double>, " +
        "array<struct<long, array<float|double>, double>>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  private lazy val vecIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val centIsFloat = right.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType](1)
    .dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, cs: Any): Any =
    VectorKernels.nearestCentroid(v.asInstanceOf[ArrayData], vecIsFloat,
      cs.asInstanceOf[ArrayData], centIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.nearestCentroid(" +
        s"$a, $vecIsFloat, $b, $centIsFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** JVM kernels behind the vector expressions (static-forwarder call
  * targets for the generated code). */
object VectorKernels {

  /** See [[NearestCentroid]]. `cents` elements are struct(id long,
    * v array, n double) in ascending-id order. */
  def nearestCentroid(vec: ArrayData, vecIsFloat: Boolean,
      cents: ArrayData, centIsFloat: Boolean): InternalRow = {
    val nVec = vec.numElements()
    var nv = 0.0
    var i = 0
    while (i < nVec) {
      val x = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      nv += x * x
      i += 1
    }
    var bestSim = Double.NaN
    var bestId = -1L
    var first = true
    var c = 0
    val nc = cents.numElements()
    while (c < nc) {
      val row = cents.getStruct(c, 3)
      val cv = row.getArray(1)
      var d = 0.0
      val n = math.min(nVec, cv.numElements())
      i = 0
      while (i < n) {
        val x = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val y = if (centIsFloat) cv.getFloat(i).toDouble else cv.getDouble(i)
        d += x * y
        i += 1
      }
      val sim = d / math.sqrt(nv * row.getDouble(2))
      // descending-sort semantics: NaN above all, strict > elsewhere
      // (equal keeps the earlier = lower-id centroid)
      if (first || (sim.isNaN && !bestSim.isNaN) || sim > bestSim) {
        bestSim = sim; bestId = row.getLong(0); first = false
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestId, bestSim))
  }
}

/** Per-element rolling polynomial hash of a string array (the q31
  * fingerprint fold, (acc·31 + codepoint) mod 1e9+7) — the
  * engine-portable shingle id for the replayable MinHash variant, in
  * one codegen'd loop per row. */
case class PolyHashArray(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("poly_hash_all needs array<string>")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TextKernels.polyHashAll(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.polyHashAll($v);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fused winnowing fingerprints over a canonical string — k-gram poly
  * hashing + rightmost-min w-window selection in one codegen'd loop
  * ([[TextKernels.winnowFingerprint]]), returning first-seen-distinct
  * (hash << 32 | pos) encoded longs. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("winnow_fingerprint needs string")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TextKernels.winnowFingerprint(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.winnowFingerprint($v, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fused content-defined chunking ([[TextKernels.cdcChunks]]): k-gram
  * boundary test + per-chunk poly hashing in one codegen'd loop,
  * returning (chunkHash << 32 | chunkLen) encoded longs in document
  * order. */
case class CdcChunks(child: Expression, k: Int, div: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("cdc_chunks needs string")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TextKernels.cdcChunks(v.asInstanceOf[UTF8String], k, div)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.cdcChunks($v, $k, ${div}L);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-facing API for the custom expressions. */
object VectorFunctions {
  private def e(c: Column): Expression = ColumnBridge.expression(c)
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(e(a), e(b)))
  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(e(a), e(b)))
  def minHashSig(hashes: Column, numPerms: Int, seed: Long): Column =
    ColumnBridge.column(MinHashSig(e(hashes), numPerms, seed))
  def simHash64(text: Column): Column =
    ColumnBridge.column(SimHash64(e(text)))
  def simHashPoly(hashes: Column, nBits: Int, seed: Long): Column =
    ColumnBridge.column(SimHashPoly(e(hashes), nBits, seed))
  def bpeMerge(symbols: Column, left: Column, right: Column): Column =
    ColumnBridge.column(BpeMerge(e(symbols), e(left), e(right)))
  def spanCorrupt(tokens: Column, mask: Column, targets: Boolean): Column =
    ColumnBridge.column(SpanCorrupt(e(tokens), e(mask), targets))
  def shingles(text: Column, n: Int, word: Boolean): Column =
    ColumnBridge.column(Shingles(e(text), n, word))
  def jaccardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSortedSim(e(a), e(b)))
  def subspaceL2(a: Column, b: Column, offset: Int, len: Int): Column =
    ColumnBridge.column(SubspaceL2(e(a), e(b), offset, len))
  def nearestCentroid(vec: Column, cents: Column): Column =
    ColumnBridge.column(NearestCentroid(e(vec), e(cents)))
  def polyHashAll(arr: Column): Column =
    ColumnBridge.column(PolyHashArray(e(arr)))
  def winnowFingerprint(s: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprint(e(s), k, w))
  def cdcChunks(s: Column, k: Int, div: Long): Column =
    ColumnBridge.column(CdcChunks(e(s), k, div))
}

/** Distinct k-shingles of a string in one pass: char mode slides a
  * k-char window; word mode joins n consecutive whitespace tokens with
  * single spaces. Replaces transform(sequence)/substr trees, which
  * re-evaluate any inlined token subtree once per element after
  * project-collapse. First-occurrence order, ASCII/BMP semantics. */
case class Shingles(child: Expression, n: Int, word: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("shingles needs string input")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TextKernels.shingles(v.asInstanceOf[UTF8String], n, word)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.shingles($v, $n, $word);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
