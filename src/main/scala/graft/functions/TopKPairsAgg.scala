package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps (at most 2k staged, k surviving) the
  * lexicographically smallest (ord, id) long pairs. Insertions append;
  * a compaction (sort + truncate to k) runs when the staging area
  * fills, so cost is O(log k) amortized per row and the buffer never
  * exceeds 2k pairs regardless of how many candidate rows flow in.
  */
final class TopKPairsBuf(val k: Int) {
  private var ords = new Array[Long](math.max(2 * k, 4))
  private var ids = new Array[Long](math.max(2 * k, 4))
  private var n = 0
  // max of the surviving k after the last compaction — admission filter
  private var bound: Long = Long.MaxValue
  private var boundId: Long = Long.MaxValue

  private def compact(): Unit = {
    val idx = Array.range(0, n).sortBy(i => (ords(i), ids(i)))
    val keep = math.min(k, n)
    val no = new Array[Long](math.max(2 * k, 4))
    val ni = new Array[Long](math.max(2 * k, 4))
    var j = 0
    while (j < keep) { no(j) = ords(idx(j)); ni(j) = ids(idx(j)); j += 1 }
    ords = no; ids = ni; n = keep
    if (n == k) { bound = ords(n - 1); boundId = ids(n - 1) }
  }

  def add(ord: Long, id: Long): Unit = {
    if (ord > bound || (ord == bound && id >= boundId)) return
    if (n == ords.length) compact()
    if (n == ords.length) return // k == n and nothing admitted? (can't happen: admission filter)
    ords(n) = ord; ids(n) = id; n += 1
  }

  def addAll(o: TopKPairsBuf): Unit = {
    var i = 0
    while (i < o.n) { add(o.ords(i), o.ids(i)); i += 1 }
  }

  /** Final (ord, id) pairs, ascending, at most k. */
  def result(): Array[(Long, Long)] = {
    compact()
    Array.tabulate(n)(i => (ords(i), ids(i)))
  }

  def serialize(): Array[Byte] = {
    compact()
    val bb = ByteBuffer.allocate(8 + 16 * n)
    bb.putInt(k); bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(ords(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKPairsBuf {
  def deserialize(bytes: Array[Byte]): TopKPairsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getInt
    val b = new TopKPairsBuf(k)
    var i = 0
    while (i < n) { val o = bb.getLong; val id = bb.getLong; b.add(o, id); i += 1 }
    b
  }
}

/** Native bounded top-k aggregate: `topk_pairs(struct(ord, id), k)` →
  * `array<struct<ord, id>>` of the k smallest pairs in (ord, id) order.
  *
  * This is the scale-correct spelling of "rank per key and keep k":
  * `row_number().over(Window.partitionBy(key))` shuffles EVERY candidate
  * row to the key's reducer, so ranking a per-query candidate expansion
  * (|corpus| rows per query in brute-force ANN) moves the whole
  * expansion; this aggregate partial-merges map-side — each partition
  * contributes at most k pairs per key to the shuffle, the same bound
  * the reference's long-top-k record sinks enforce
  * (`griffin/engine/orderby/LimitedSizeLongTreeChain.java`).
  */
case class TopKPairsAgg(child: Expression, k: Int,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuf] with UnaryLike[Expression] {

  require(k > 0, "topk_pairs: k must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(fields)
        if fields.length == 2 && fields.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_pairs needs struct<bigint,bigint>, got $other")
    }

  override def createAggregationBuffer(): TopKPairsBuf = new TopKPairsBuf(k)

  override def update(b: TopKPairsBuf, input: InternalRow): TopKPairsBuf = {
    val r = child.eval(input).asInstanceOf[InternalRow]
    if (r != null && !r.isNullAt(0) && !r.isNullAt(1)) b.add(r.getLong(0), r.getLong(1))
    b
  }

  override def merge(b: TopKPairsBuf, o: TopKPairsBuf): TopKPairsBuf = { b.addAll(o); b }

  override def eval(b: TopKPairsBuf): Any =
    new GenericArrayData(b.result().map { case (o, i) => InternalRow(o, i) })

  override def serialize(b: TopKPairsBuf): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TopKPairsBuf =
    TopKPairsBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKPairsAgg =
    copy(child = c)
  override def prettyName: String = "topk_pairs"
}

object TopKPairsAgg {
  /** Register `topk_pairs(pair_struct, k)` for SQL (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_pairs",
      exprs => {
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case Literal(v: Long, LongType) => v.toInt
          case other => throw new IllegalArgumentException(
            s"topk_pairs: k must be an integer literal, got $other")
        }
        TopKPairsAgg(exprs.head, k).toAggregateExpression()
      },
      "built-in")
}
