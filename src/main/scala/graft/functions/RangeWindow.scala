package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** O(n) evaluation of `first_value` / `last_value` / `min` / `max` over
  * sliding time-RANGE window frames
  * (`RANGE BETWEEN K PRECEDING AND CURRENT ROW`).
  *
  * Spark's `SlidingWindowFunctionFrame` re-aggregates the whole frame
  * buffer every time the frame's lower bound moves — O(rows × frame).
  * On the reference's 400k-row window tests a frame spanning ~80k rows
  * needs ~10^10 row visits and times out; at 100 TB the same plan is a
  * scale-killer on any dense time series. The reference instead keeps a
  * ring buffer / monotonic deque of in-frame candidates and advances
  * two pointers per row (`functions/window/
  * FirstValueDoubleWindowFunctionFactory.java`,
  * `MaxDoubleWindowFunctionFactory.java` dequeue scheme), O(rows)
  * amortized.
  *
  * The same algorithm maps onto a running frame (`RANGE BETWEEN
  * UNBOUNDED PRECEDING AND CURRENT ROW`), which Spark's
  * `UnboundedPrecedingWindowFunctionFrame` feeds incrementally — one
  * `update` per row, never re-scanning. This aggregate prunes entries
  * older than `curKey - bound` on each update, so at evaluation time
  * the deque holds exactly the sliding frame's candidates. Peer rows
  * (equal order keys) are handled by the RANGE running frame itself:
  * all peers are added before the group is evaluated, matching
  * RANGE-frame peer-inclusive semantics. `DialectRewrites
  * .slidingValueFrames` rewrites the sliding spelling onto this
  * aggregate; DESC order is handled there by negating the key.
  *
  * Modes: `first` / `first_in` (ignore nulls) keep every candidate in
  * the frame (the successor is needed when the front expires — same
  * memory bound as the reference's ring buffer); `last` / `last_in`
  * keep one candidate; `min` / `max` keep a monotonic deque. The value
  * type is preserved (`dataType = value.dataType`), so timestamps,
  * longs, decimals and strings all round-trip.
  */
/** ArrayDeque rejects nulls — respect-nulls `first` frames must hold
  * them, so nulls ride as this sentinel. */
object SlideNull extends Serializable

final class SlideBuf extends Serializable {
  val ks = new java.util.ArrayDeque[java.lang.Long]()
  val vs = new java.util.ArrayDeque[Any]()
  var curKey: Long = Long.MinValue
  var seen: Boolean = false
  // single-candidate state for `last` modes
  var candKey: Long = Long.MinValue
  var candV: Any = null
  var has: Boolean = false
}

case class SlidingRangeAgg(value: Expression, key: Expression,
                           bound: Long, mode: String,
                           override val mutableAggBufferOffset: Int = 0,
                           override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SlideBuf] with BinaryLike[Expression] {

  require(Set("first", "first_in", "last", "last_in", "min", "max",
    "min_dec", "max_dec")(mode),
    s"__w_slide: unknown mode $mode")

  override def left: Expression = value
  override def right: Expression = key
  override def dataType: DataType = value.dataType
  override def nullable: Boolean = true

  @transient private lazy val ord: Ordering[Any] =
    // the _dec modes ride the decimal-string carrier (DECIMAL256 tier,
    // p > 38) — NUMERIC order, not the carrier's lexicographic one
    if (mode.endsWith("_dec"))
      new Ordering[Any] {
        def compare(a: Any, b: Any): Int =
          new java.math.BigDecimal(a.toString)
            .compareTo(new java.math.BigDecimal(b.toString))
      }
    else TypeUtils.getInterpretedOrdering(value.dataType)
  private val isMin = mode == "min" || mode == "min_dec"
  private val isMax = mode == "max" || mode == "max_dec"
  private val ignoreNulls = mode.endsWith("_in") || isMin || isMax

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    key.dataType match {
      case LongType | IntegerType | TimestampType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"__w_slide key must be integral/timestamp, got $other")
    }

  override def createAggregationBuffer(): SlideBuf = new SlideBuf

  private def keyOf(input: InternalRow): Long = key.eval(input) match {
    case null => Long.MinValue
    case l: java.lang.Long => l.longValue
    case i: java.lang.Integer => i.longValue
    case other => other.toString.toLong
  }

  private def frameLo(cur: Long): Long =
    if (cur < Long.MinValue + bound) Long.MinValue else cur - bound

  private def pruneFront(b: SlideBuf): Unit = {
    val lo = frameLo(b.curKey)
    while (!b.ks.isEmpty && b.ks.peekFirst.longValue < lo) {
      b.ks.pollFirst(); b.vs.pollFirst()
    }
  }

  override def update(b: SlideBuf, input: InternalRow): SlideBuf = {
    val k = keyOf(input)
    b.curKey = k; b.seen = true
    val v0 = value.eval(input)
    val v = if (v0 == null) null else InternalRow.copyValue(v0)
    mode match {
      case "first" | "first_in" =>
        if (!ignoreNulls || v != null) {
          b.ks.addLast(k); b.vs.addLast(if (v == null) SlideNull else v)
        }
      case "last" | "last_in" =>
        if (!ignoreNulls || v != null) { b.candKey = k; b.candV = v; b.has = true }
      case "max" | "max_dec" =>
        if (v != null) {
          while (!b.vs.isEmpty && ord.compare(b.vs.peekLast, v) <= 0) {
            b.vs.pollLast(); b.ks.pollLast()
          }
          b.ks.addLast(k); b.vs.addLast(v)
        }
      case "min" | "min_dec" =>
        if (v != null) {
          while (!b.vs.isEmpty && ord.compare(b.vs.peekLast, v) >= 0) {
            b.vs.pollLast(); b.ks.pollLast()
          }
          b.ks.addLast(k); b.vs.addLast(v)
        }
    }
    pruneFront(b)
    b
  }

  /** Key-sorted merge — the window path never merges, but `__w_slide`
    * is a registered session function, so a grouped/partial-aggregate
    * use must still be correct for every mode under Spark's ARBITRARY
    * partition merge order. Each side's deque is key-sorted, so a
    * two-pointer merge keeps the merged deque key-sorted even when
    * shard key-ranges interleave; the min/max modes re-apply the
    * pop-from-back dominance rule entry by entry, restoring the
    * monotonic-deque invariant (either side's surviving tail may be
    * dominated by the other side's values). */
  override def merge(b: SlideBuf, o: SlideBuf): SlideBuf = {
    if (!o.seen) return b
    if (!b.seen) return o
    val (lo, hi) = if (b.curKey <= o.curKey) (b, o) else (o, b)
    if (!hi.ks.isEmpty || !lo.ks.isEmpty) {
      val mks = new java.util.ArrayDeque[java.lang.Long]()
      val mvs = new java.util.ArrayDeque[Any]()
      val popLe = isMax; val deque = isMin || popLe
      def push(k: java.lang.Long, v: Any): Unit = {
        if (deque) {
          while (!mvs.isEmpty && {
            val c = ord.compare(mvs.peekLast, v); if (popLe) c <= 0 else c >= 0
          }) { mvs.pollLast(); mks.pollLast() }
        }
        mks.addLast(k); mvs.addLast(v)
      }
      while (!lo.ks.isEmpty || !hi.ks.isEmpty) {
        val takeLo = !lo.ks.isEmpty && (hi.ks.isEmpty ||
          lo.ks.peekFirst.longValue <= hi.ks.peekFirst.longValue)
        if (takeLo) push(lo.ks.pollFirst(), lo.vs.pollFirst())
        else push(hi.ks.pollFirst(), hi.vs.pollFirst())
      }
      lo.ks.addAll(mks); lo.vs.addAll(mvs)
    }
    if (hi.has && (!lo.has || hi.candKey >= lo.candKey)) {
      lo.candKey = hi.candKey; lo.candV = hi.candV; lo.has = true
    }
    lo.curKey = hi.curKey
    pruneFront(lo)
    lo
  }

  override def eval(b: SlideBuf): Any = {
    pruneFront(b)
    mode match {
      case "first" | "first_in" | "min" | "max" | "min_dec" | "max_dec" =>
        if (b.ks.isEmpty) null
        else b.vs.peekFirst match { case SlideNull => null; case v => v }
      case "last" | "last_in" =>
        if (b.has && b.candKey >= frameLo(b.curKey)) b.candV else null
    }
  }

  override def serialize(b: SlideBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(b); oos.close()
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): SlideBuf = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    ois.readObject().asInstanceOf[SlideBuf]
  }

  override def withNewMutableAggBufferOffset(o: Int): SlidingRangeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SlidingRangeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SlidingRangeAgg =
    copy(value = l, key = r)
  override def prettyName: String = "__w_slide"
}

object RangeWindow {
  /** Register `__w_slide(value, keyMicros, boundMicros, 'mode')`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "__w_slide",
      exprs => {
        val bound = exprs(2) match {
          case Literal(v: Long, LongType) => v
          case Literal(v: Int, IntegerType) => v.toLong
          case other => throw new IllegalArgumentException(
            s"__w_slide: bound must be an integral literal, got $other")
        }
        val mode = exprs(3) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"__w_slide: mode must be a string literal, got $other")
        }
        SlidingRangeAgg(exprs(0), exprs(1), bound, mode).toAggregateExpression()
      },
      "built-in")
}
