package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Native Catalyst AGGREGATE: bounded top-k by exact integer-dot cosine —
  * the skew-safe replacement for the `row_number() OVER (PARTITION BY
  * query_id ORDER BY cos DESC, vec_id)` funnel every ANN query ends in.
  *
  * The window form shuffles EVERY candidate row into |Q| partitions (one
  * per query) and sorts there — at 100 TB with a handful of queries that
  * is a worst-case skew: N rows land on |Q| tasks. This aggregate keeps a
  * ≤k buffer per partition per query (update), merges buffers map-side
  * (TypedImperativeAggregate partial aggregation), so the exchange
  * carries at most partitions × |Q| × k tiny rows and no task ever holds
  * more than k candidates per query. Same preference tier as [[DotI64]]:
  * a custom Catalyst aggregate beats a window where the aggregate's
  * algebra (bounded, mergeable) fits.
  *
  * Input: `struct(vec_id: long, dot: long, nq: long, nc: long)` — the
  * exact integer evidence. Ordering is the engine-wide ANN contract,
  * `(cos DESC, vec_id ASC)` with `cos = dot / sqrt(nq·nc)` in the same
  * IEEE double ops as the declarative/SQL forms, so results (including
  * ties) are bit-identical to the window form it replaces. Output:
  * `array<struct<vec_id: long, cos: double>>` sorted best-first; callers
  * derive `rnk` from position (posexplode) and round for display.
  */
case class TopKCos(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long, Long, Long)]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(fs)
        if fs.length == 4 && fs.forall(_.dataType == LongType) =>
      if (k > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("topk_cos requires k > 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_cos requires struct(vec_id,dot,nq,nc) all bigint, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(new StructType()
    .add("vec_id", LongType).add("cos", DoubleType), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_cos"

  private def cos(e: (Long, Long, Long, Long)): Double =
    e._2 / math.sqrt(e._3.toDouble * e._4.toDouble)

  /** (cos DESC, vec_id ASC) — the ANN ordering contract.
    * `Double.compare`, not raw `>`: a zero-norm vector yields cos = NaN,
    * and both Spark's sort order and DuckDB treat NaN as LARGER than any
    * double (first under DESC) — raw `>` would instead sink NaN last and
    * silently diverge from the window/oracle forms on degenerate input. */
  private def better(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)): Boolean = {
    val c = java.lang.Double.compare(cos(a), cos(b))
    c > 0 || (c == 0 && a._1 < b._1)
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long, Long, Long)] =
    ArrayBuffer.empty

  /** Insert keeping the buffer sorted best-first and ≤ k (k is small —
    * linear insertion beats heap constants). */
  private def insert(
      buf: ArrayBuffer[(Long, Long, Long, Long)],
      e: (Long, Long, Long, Long)): Unit = {
    if (buf.length == k && !better(e, buf.last)) return
    var i = buf.length
    while (i > 0 && better(e, buf(i - 1))) i -= 1
    buf.insert(i, e)
    if (buf.length > k) buf.remove(k)
    ()
  }

  override def update(
      buf: ArrayBuffer[(Long, Long, Long, Long)],
      input: InternalRow): ArrayBuffer[(Long, Long, Long, Long)] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    // skip rows with ANY null field, matching the window form: a null
    // cosine sorts LAST under DESC there, so it can never enter a top-k
    // that has k non-null candidates — reading a null as getLong's 0
    // would instead rank it as a real cos=0 candidate and diverge.
    // KNOWN divergence in the sparse-candidate regime: with FEWER than
    // k non-null candidates the window form still emits the null-cos
    // rows in its tail while this aggregate omits them — acceptable
    // because the engine's candidate streams are integer dots over
    // non-null fixed-width vectors (nulls cannot reach this path; a
    // future nullable caller must pre-filter or accept omission)
    if (row != null && !row.isNullAt(0) && !row.isNullAt(1) &&
        !row.isNullAt(2) && !row.isNullAt(3))
      insert(buf, (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)))
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Long, Long, Long, Long)],
      other: ArrayBuffer[(Long, Long, Long, Long)]): ArrayBuffer[(Long, Long, Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long, Long, Long)]): Any =
    new GenericArrayData(buf.map { e =>
      InternalRow(e._1, cos(e)): Any
    }.toArray)

  override def serialize(buf: ArrayBuffer[(Long, Long, Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 32)
    bb.putInt(buf.length)
    buf.foreach { e => bb.putLong(e._1); bb.putLong(e._2); bb.putLong(e._3); bb.putLong(e._4) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long, Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Long, Long, Long, Long)]
    var i = 0
    while (i < n) {
      buf += ((bb.getLong, bb.getLong, bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKCos =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKCos =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKCos =
    copy(child = newChildren.head)
}

object TopKCos {
  /** Registry form: `topk_cos(struct(vec_id, dot, nq, nc), k)` with k a
    * literal. */
  def fromArgs(exprs: Seq[Expression]): TopKCos = exprs match {
    case Seq(input, Literal(k: Int, IntegerType)) => TopKCos(input, k)
    case Seq(input, Literal(k: Long, LongType)) =>
      // guard, don't truncate: a Long literal outside Int range would
      // otherwise silently become a DIFFERENT positive k via toInt
      if (k < 1 || k > Int.MaxValue) throw new IllegalArgumentException(
        s"topk_cos(input_struct, k): k must be in [1, ${Int.MaxValue}]; got $k")
      else TopKCos(input, k.toInt)
    case _ => throw new IllegalArgumentException(
      "topk_cos(input_struct, k): k must be an integer literal")
  }
}
