package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native Catalyst expressions replacing the hot interpreted
  * higher-order-function (`transform` / `aggregate`) lambdas on scan
  * paths (guide §4: HOFs are CodegenFallback — per-element lambda
  * dispatch with variable binding — while a native expression's loop is
  * compiled code riding whole-stage codegen like [[DotI64]]).
  *
  * Each expression's per-element math is BIT-IDENTICAL to the HOF chain
  * it replaces (specs pin equality against the original expressions on
  * adversarial inputs), so every oracle-checked query hash is unchanged.
  */

/** `quantize_i64(array<double|float>)` ≡ the engine-wide embedding
  * quantization `transform(a, x -> cast(round(x * 100, 0) as bigint))`,
  * exactly as Spark's coercion rules resolve it: `float × int` widens to
  * DOUBLE (probed on 4.1.2), so BOTH element types run the double chain —
  * a float element is first widened, then ×100, Spark
  * `round`-for-double semantics (NaN/Infinity pass through the rounding
  * untouched, else `BigDecimal.valueOf(y).setScale(0, HALF_UP)` —
  * verified against RoundBase's DoubleType branch), then `(long)` cast
  * semantics (truncation toward zero, NaN→0, saturating at Long
  * bounds). Null elements stay null. The parquet embedding columns are
  * `array<float>`; spec fixtures hand in doubles.
  *
  * OVERFLOW CONTRACT (the [[DotI64]] rule): inputs must be quantization-
  * bounded — |x·100| < 2^63 and finite, which every embedding satisfies
  * by orders of magnitude. On out-of-contract values this expression
  * saturates/zeroes where the ANSI-mode HOF chain raises CAST_OVERFLOW;
  * in-contract the two are bit-identical (ArrayKernelsSpec, double AND
  * float). */
case class QuantizeI64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_i64 requires array<double> or array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantize_i64"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    if (isFloat) QuantizeI64.quantizeFloat(a.asInstanceOf[ArrayData])
    else QuantizeI64.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (isFloat) "quantizeFloat" else "quantize"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.QuantizeI64.$method($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeI64 =
    copy(child = newChild)
}

object QuantizeI64 {
  /** Exact Spark semantics for `round(y, 0)` on a finite DOUBLE —
    * `BigDecimal.valueOf(y).setScale(0, HALF_UP).doubleValue()` — WITHOUT
    * the per-element BigDecimal allocation (r21: the BigDecimal was ~2 s
    * of every 64×-scale quantizing scan — 8.2M allocations — measured by
    * ClipProbe as the residue of q_media_clip_filter's fixture after the
    * lambda removal). Equivalence argument, pinned empirically in
    * ArrayKernelsSpec's million-value sweep against BigDecimal itself:
    *
    *  - HALF_UP rounds AWAY FROM ZERO, i.e. it is symmetric in
    *    magnitude: round on `a = |y|`, then re-apply the sign.
    *  - `fa = floor(a)` and `fra = a − fa` are EXACT in IEEE754 for
    *    a ≥ 0: trivial below 1 (fa = 0); Sterbenz above (a < fa + 1 ≤
    *    2·fa, so the subtraction is exact), and for a ≥ 2^52 every
    *    double is integral so fra = 0. (The signed form `y − floor(y)`
    *    is NOT exact across binades — −0.49999999999999994 + 1 rounds
    *    to exactly 0.5, the bug the spec sweep caught.)
    *  - BigDecimal.valueOf parses Double.toString(y) — the SHORTEST
    *    decimal uniquely identifying y. The HALF_UP decision compares
    *    that decimal against the boundary n + 0.5, which is itself
    *    exactly representable as a double wherever fra can be 0.5; a
    *    shortest-decimal repr strictly preserves ordering against any
    *    exactly-representable boundary, so `fra <=> 0.5` in binary
    *    decides identically to BigDecimal's decimal comparison.
    *  - The tie (fra = 0.5) goes to fa + 1 — away from zero. */
  def roundHalfUp(y: Double): Double = {
    val a = Math.abs(y)
    val fa = Math.floor(a)
    val fra = a - fa
    val ra = if (fra < 0.5) fa else fa + 1
    if (y < 0) -ra else ra
  }

  /** Exact Spark semantics for `cast(round(x * 100, 0) as bigint)`. */
  def quantizeOne(x: Double): Long = {
    val y = x * 100
    val r =
      if (java.lang.Double.isNaN(y) || java.lang.Double.isInfinite(y)) y
      else roundHalfUp(y)
    r.toLong
  }

  /** Exact Spark semantics for `cast(round(x * 100, 0) as bigint)` on a
    * FLOAT element: Spark's arithmetic coercion widens `float × int` to
    * DOUBLE (probed empirically on 4.1.2 — `transform(a, x -> x * 100)`
    * over array<float> resolves to array<double>), so the whole chain is
    * the double path on the widened element. */
  def quantizeOneF(x: Float): Long = quantizeOne(x.toDouble)

  def quantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    // null elements are possible on arbitrary inputs: build boxed only
    // when one appears, else the primitive fast path
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      var j = 0
      while (j < n) { out(j) = quantizeOne(a.getDouble(j)); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        if (!a.isNullAt(j)) out(j) = quantizeOne(a.getDouble(j))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  def quantizeFloat(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      var j = 0
      while (j < n) { out(j) = quantizeOneF(a.getFloat(j)); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        if (!a.isNullAt(j)) out(j) = quantizeOneF(a.getFloat(j))
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `neg_prefix_i64(array<bigint>, k)` ≡ the clip-fixture pair
  * construction `transform(a, (x, i) -> if(i < k, -x, x))`: negate the
  * first `k` elements (0-based index strictly below `k`; `k ≤ 0` flips
  * nothing, `k ≥ length` flips all). `k` is per-row (e.g.
  * `media_id % 48`), int or bigint. Null elements stay null. Negation
  * wraps on Long.MinValue (the [[DotI64]] overflow contract; the ANSI
  * HOF chain raises there) — quantized inputs never reach it. */
case class NegPrefixI64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"neg_prefix_i64 requires (array<bigint>, int/bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType,
    left.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "neg_prefix_i64"

  private def kOf(b: Any): Long = b match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
    case other => other.asInstanceOf[Number].longValue()
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    NegPrefixI64.negPrefix(a.asInstanceOf[ArrayData], kOf(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.functions.NegPrefixI64.negPrefix($a, (long)$k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NegPrefixI64 =
    copy(left = newLeft, right = newRight)
}

object NegPrefixI64 {
  def negPrefix(a: ArrayData, k: Long): ArrayData = {
    val n = a.numElements()
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      var j = 0
      while (j < n) {
        val v = a.getLong(j)
        out(j) = if (j < k) -v else v
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        if (!a.isNullAt(j)) {
          val v = a.getLong(j)
          out(j) = if (j < k) -v else v
        }
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `ffd_pack(ds, capacity)` ≡ the best-fit packer's interpreted
  * `aggregate(ds, …)` first-fit-decreasing fold
  * ([[graft.queries.PipelineQueries.packBestFit]]): walk the
  * (n DESC, doc_id)-sorted `array<struct<k1,k2:doc_id,n>>` once, placing
  * each doc in the FIRST bin whose load + n ≤ capacity, opening a new
  * bin (1-based id = bins so far + 1) when none fits — an over-capacity
  * doc therefore opens its own dedicated overflow bin, exactly like the
  * fold. Emits `array<struct<doc_id,n,bin>>` in input order.
  *
  * The interpreted fold was O(group²) in ALLOCATIONS (per element:
  * three `transform` array rebuilds over the loads plus a full copy of
  * the accumulated assignment array via `concat`), interpreted
  * per-lambda — measured as the whole cost of the q_pipeline_pack_bestfit
  * bench row. This loop is O(group × bins) long-array arithmetic in
  * compiled code with two allocations total. Inputs are non-null by
  * construction (`collect_list` of structs over non-null counts);
  * `capacity` is a positive int literal (loop control, like
  * [[TopKCos]]'s k). */
case class FfdPack(child: Expression, capacity: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 3 && fs.forall(_.dataType == LongType) =>
      if (capacity > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("ffd_pack requires capacity > 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"ffd_pack requires array<struct<k1,k2,n bigint>>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(new StructType()
    .add("doc_id", LongType).add("n", LongType).add("bin", LongType),
    containsNull = false)
  override def prettyName: String = "ffd_pack"

  override def nullSafeEval(a: Any): Any =
    FfdPack.pack(a.asInstanceOf[ArrayData], capacity)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FfdPack.pack($a, $capacity);")

  override protected def withNewChildInternal(newChild: Expression): FfdPack =
    copy(child = newChild)
}

object FfdPack {
  def pack(ds: ArrayData, capacity: Int): ArrayData = {
    val n = ds.numElements()
    val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val row = ds.getStruct(i, 3)
      val docId = row.getLong(1)
      val sz = row.getLong(2)
      // first bin with room (the fold's array_position over loads)
      var bin = -1
      var b = 0
      while (bin < 0 && b < loads.length) {
        if (loads(b) + sz <= capacity) bin = b
        b += 1
      }
      if (bin < 0) { loads += sz; bin = loads.length - 1 }
      else loads(bin) += sz
      out(i) = InternalRow(docId, sz, (bin + 1).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Registry form: `ffd_pack(ds, capacity)` with capacity a literal. */
  def fromArgs(exprs: Seq[Expression]): FfdPack = exprs match {
    case Seq(input,
        org.apache.spark.sql.catalyst.expressions.Literal(c: Int, IntegerType)) =>
      FfdPack(input, c)
    case _ => throw new IllegalArgumentException(
      "ffd_pack(ds, capacity): capacity must be an int literal")
  }
}
